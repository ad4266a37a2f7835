"""ANN quality probe: recall@k of the approximate searchers against the
exact brute-force top-k, per query vector.

Correctness gates already verify the ANN pipelines are computed as
specified (vec_lsh_knn / vec_ivf_knn oracles recompute signatures /
codebook). This probe answers the other question a 100 TB user asks:
how much recall does the approximation give up, and how does nprobe
trade recall for scan fraction?

Usage: python tools/ann_recall_probe.py [sf_dir] [n_queries]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from doris_spark.operators import vector as V
    from doris_spark.session import get_spark, load_tables

    spark = get_spark("ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir)["embeddings"].cache()
    emb.count()
    k = 10

    qids = [r[0] for r in emb.select("vec_id").orderBy("vec_id").limit(n_q).collect()]
    configs = [
        ("ivf_nprobe2", dict(n_centroids=16, nprobe=2)),
        ("ivf_nprobe4", dict(n_centroids=16, nprobe=4)),
        ("ivf_nprobe8", dict(n_centroids=16, nprobe=8)),
    ]
    lsh_cfgs = [("lsh_exact_bucket", 0), ("lsh_probe1bit", 1), ("lsh_probe2bit", 2)]
    for name, cfg in configs + [(n, ("lsh", b)) for n, b in lsh_cfgs]:
        hits = tot = 0
        for qid in qids:
            corpus = emb.filter(F.col("vec_id") != qid)
            query = emb.filter(F.col("vec_id") == qid)
            exact = {r["vec_id"] for r in
                     V.knn(corpus, query, "embedding", "vec_id", k=k, metric="l2").collect()}
            if isinstance(cfg, tuple) and cfg[0] == "lsh":
                approx = {r["vec_id"] for r in
                          V.lsh_bucketed_knn(corpus, query, "embedding", "vec_id",
                                             dim=64, k=k, probe_bits=cfg[1]).collect()}
            else:
                approx = {r["vec_id"] for r in
                          V.ivf_knn(corpus, query, "embedding", "vec_id", k=k, **cfg).collect()}
            hits += len(exact & approx)
            tot += len(exact)
        print(json.dumps({"config": name, "recall_at_10": round(hits / tot, 3),
                          "n_queries": n_q}))


if __name__ == "__main__":
    main()
