"""Scaling probe for the MinHash+LSH near-dup pipeline.

The 100 TB question for dedup is whether cost grows with O(n·bands)
(bucket-restricted self-join) or O(n²) (all-pairs). This probe runs
operators/dedup.minhash_lsh_pairs over k replicas of the documents
fixture (ids offset per replica, text salted so replicas do not
trivially collide) and reports wall time and candidate-pair counts per
scale step. Near-linear seconds across k — versus the k² growth an
all-pairs plan would show — is the pass signal.

Usage: python tools/scale_probe_dedup.py [sf_dir] [k1,k2,...]
Defaults: /root/testdata/sf0.01 and 1,2,4.
Prints one JSON line per scale step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else ("1", "2", "4"))]

    from pyspark.sql import functions as F

    from doris_spark.operators import dedup as D
    from doris_spark.session import get_spark, load_tables

    spark = get_spark("scale_probe_dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")

    # distinct character rotations per replica: cross-replica texts share
    # almost no shingles, so the duplicate structure (and the pair count
    # per document) stays that of the base corpus — scaling k multiplies
    # the WORK, not the similarity graph
    rotations = "abcdehnorst"

    docs.limit(10).count()  # warm the session + parquet footers

    for k in ks:
        rep = None
        for i in range(k):
            rot = rotations[i % len(rotations)] + rotations
            c = docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000_000)).alias("doc_id"),
                F.translate(F.col("text"), rotations, rot[: len(rotations)]).alias("text")
                if i
                else F.col("text"),
            )
            rep = c if rep is None else rep.unionAll(c)
        t0 = time.time()
        pairs = D.minhash_lsh_pairs(
            rep, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3
        ).count()
        sec = time.time() - t0
        print(json.dumps({
            "k": k,
            "n_docs": rep.count(),
            "candidate_pairs": pairs,
            "sec": round(sec, 2),
        }))


if __name__ == "__main__":
    main()
