"""Scale probe: do the heavy pipeline operators scale linearly?

Duplicates the sf0.1 documents/embeddings fixtures K times (with shifted
ids so dedup/join cardinalities scale honestly), then times the
shuffle-heavy LLM-pipeline operators at 1x and Kx. A linear operator
shows ~Kx wall time; super-linear growth flags a plan that would not
survive 100 TB. Results go to stdout and /tmp/scale_probe.json; the
summary table lives in PLANS.md.

Run: python tools/scale_probe.py [K]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from doris_spark import queries as Q  # noqa: E402
from doris_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
OUT = "/tmp/scale_probe_data"

PROBES = ["txt_exact_dedup", "txt_minhash_pairs", "txt_simhash", "vec_knn_cosine", "txt_langid"]


def build_scaled(k: int) -> str:
    """K copies of documents/embeddings with shifted ids (duckdb writes
    single parquet FILES — load_tables reads footers via pyarrow); the
    other tables are copied verbatim."""
    import duckdb

    shutil.rmtree(OUT, ignore_errors=True)
    import os

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, idcol in (("documents", "doc_id"), ("embeddings", "vec_id")):
        src = f"{SF}/{table}.parquet"
        n = con.execute(f"SELECT max({idcol}) + 1 FROM '{src}'").fetchone()[0]
        union = " UNION ALL ".join(
            f"SELECT * REPLACE ({idcol} + {i * n} AS {idcol}) FROM '{src}'" for i in range(k)
        )
        con.execute(f"COPY ({union}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    for name in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"):
        shutil.copyfile(f"{SF}/{name}.parquet", f"{OUT}/{name}.parquet")
    return OUT


def time_query(name: str, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    Q.QUERIES[name](spark, sf_dir).collect()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 2)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    Q.load_all()
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(k)

    report = {}
    for name in PROBES:
        time_query(name, spark, SF)  # codegen warm-up per plan
        base = time_query(name, spark, SF)
        big = time_query(name, spark, scaled_dir)
        ratio = round(big / base, 1) if base > 0 else None
        report[name] = {"t_1x": base, f"t_{k}x": big, "ratio": ratio}
        print(f"{name}: 1x={base}s {k}x={big}s ratio={ratio} (linear={k})")
    json.dump({"k": k, "probes": report}, open("/tmp/scale_probe.json", "w"), indent=1)


if __name__ == "__main__":
    main()
