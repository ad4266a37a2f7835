"""Roaring compressed bitmap tier (functions/roaring.py).

Reference: be/src/util/bitmap_value.h (Roaring64Map),
be/src/exprs/aggregate/aggregate_function_bitmap.h.
"""

from __future__ import annotations

import numpy as np
import pytest

from doris_spark.functions import roaring as RB


def test_roundtrip_sparse_and_dense():
    sparse = np.array([1, 5, 70000, 2**40 + 3], dtype=np.int64)
    assert RB.to_array(RB.serialize(sparse)).tolist() == sorted(sparse.tolist())
    # dense container: >4096 lows in one 65536-block switches to bitset
    dense = np.arange(10_000, dtype=np.int64)
    blob = RB.serialize(dense)
    assert RB.cardinality(blob) == 10_000
    assert RB.to_array(blob).tolist() == list(range(10_000))


def test_dense_smaller_than_array_encoding():
    dense = np.arange(60_000, dtype=np.int64)  # one nearly-full container
    blob = RB.serialize(dense)
    assert len(blob) < 60_000 * 2  # bitset (8 KiB) beats uint16 array
    assert RB.cardinality(blob) == 60_000


def test_merge_and_duplicates():
    a = RB.serialize([1, 2, 3, 100_000])
    b = RB.serialize([3, 4, 100_000, 2**33])
    m = RB.merge([a, b])
    assert RB.to_array(m).tolist() == [1, 2, 3, 4, 100_000, 2**33]
    assert RB.cardinality(m) == 6
    # empty + None handling
    assert RB.cardinality(RB.merge([RB.serialize([]), None, a])) == 4


def test_negative_values_roundtrip():
    vals = [-5, -1, 0, 7]
    got = sorted(RB.to_array(RB.serialize(vals)).tolist())
    assert got == sorted(vals)


def test_union_compressed_matches_exact(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "g": ["a", "b"] * 500,
            "v": [i // 2 for i in range(1000)],  # each group sees 0..499
        }
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = RB.bitmap_union_compressed(df, ["g"], "v")
    rows = {
        r.g: r
        for r in out.select(
            "g",
            RB.bitmap_count_col(out.bm).alias("c"),
            RB.bitmap_to_array_col(out.bm).alias("arr"),
        ).collect()
    }
    assert rows["a"].c == 500 and rows["b"].c == 500
    assert rows["a"].arr == sorted(set(range(500)))


def test_compressed_blob_bounded_at_high_cardinality(spark):
    # the scale property: blob size ~ distinct/65536 containers x <=8 KiB,
    # far below 8 bytes x distinct
    n = 200_000
    df = spark.range(n).selectExpr("1 AS g", "id AS v").repartition(8)
    out = RB.bitmap_union_compressed(df, ["g"], "v")
    row = out.select(RB.bitmap_count_col(out.bm).alias("c"), "bm").collect()[0]
    assert row.c == n
    assert len(row.bm) < n  # ~25 KiB vs 1.6 MB raw int64
