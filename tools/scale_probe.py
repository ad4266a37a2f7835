"""Cardinality scale probe for the bitmap tiers (VERDICT r4 #3).

Runs bitmap_union at increasing per-group cardinality through BOTH
tiers and reports the per-task state footprint each carries:

- array tier (functions/sketches.py): collect_set/flatten — state is
  8 bytes x distinct per group, materialized in one task;
- roaring tier (functions/roaring.py): compressed containers — state
  is <= 8 KiB per 65536-value block, independent of raw row count.

Usage: python tools/scale_probe.py [n_values_per_group]
Default n = 2,000,000 (10x the sf0.1 fixture's largest bitmap group).
Prints one JSON line per tier.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from pyspark.sql import functions as F

    from doris_spark.functions import roaring as RB
    from doris_spark.functions import sketches as SK
    from doris_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # 4 groups x n distinct values each, spread over 32 partitions
    df = (
        spark.range(4 * n)
        .select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") / 4).cast("bigint").alias("v"),
        )
        .repartition(32)
    )

    t0 = time.time()
    out = RB.bitmap_union_compressed(df, ["g"], "v")
    rows = out.select(
        "g", RB.bitmap_count_col(F.col("bm")).alias("c"), F.length("bm").alias("sz")
    ).collect()
    roaring_s = time.time() - t0
    assert all(r.c == n for r in rows), rows
    print(json.dumps({
        "tier": "roaring", "n_per_group": n, "groups": len(rows),
        "sec": round(roaring_s, 2),
        "state_bytes_per_group": max(r.sz for r in rows),
        "raw_bytes_per_group": 8 * n,
        "compression": round(8 * n / max(r.sz for r in rows), 1),
    }))

    t0 = time.time()
    arr = df.groupBy("g").agg(SK.bitmap_agg("v").alias("bm"))
    rows2 = arr.select("g", F.size("bm").alias("c")).collect()
    array_s = time.time() - t0
    assert all(r.c == n for r in rows2)
    print(json.dumps({
        "tier": "array", "n_per_group": n, "groups": len(rows2),
        "sec": round(array_s, 2),
        "state_bytes_per_group": 8 * n,
    }))


if __name__ == "__main__":
    main()
