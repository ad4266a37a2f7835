"""Sketch-type function families: BITMAP / HLL / QUANTILE_STATE.

Reference analogs: bitmap type + ~45 scalar/agg functions
(be/src/exprs/function/function_bitmap.cpp, aggregates
be/src/exprs/aggregate/aggregate_function_bitmap.h), HLL
(function_hll.cpp, hll_union aggregates), QUANTILE_STATE
(function_quantile_state.cpp).

Spark-first design:
- BITMAP semantics = exact distinct integer sets. Represented as sorted
  array<bigint> columns — every bitmap_* function maps to a native array
  expression (codegen, no UDF). At very high cardinality per group a
  RoaringBitmap UDAF would replace the array representation; the API
  surface here is representation-agnostic so that swap is local.
- HLL = Spark's built-in Apache DataSketches HLL (hll_sketch_agg /
  hll_union_agg / hll_sketch_estimate) — binary sketch columns exactly
  like the reference's HLL columns, mergeable across partitions.
- QUANTILE_STATE = percentile_approx's internal sketch; quantile_percent
  maps to percentile_approx.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ------------------------------------------------------------------ BITMAP
# A "bitmap" column is array<bigint>, kept sorted+distinct by construction.


def to_bitmap(x) -> Column:
    """Doris to_bitmap(value) — single-element bitmap."""
    return F.array(_c(x).cast("bigint"))


def bitmap_from_array(a) -> Column:
    return F.array_sort(F.array_distinct(_c(a).cast("array<bigint>")))


def bitmap_union_agg(x) -> Column:
    """Aggregate: bitmap_union over a bitmap column (array<bigint>)."""
    return F.array_sort(F.array_distinct(F.flatten(F.collect_list(_c(x)))))


def bitmap_agg(x) -> Column:
    """Aggregate: build a bitmap from a value column (Doris bitmap_agg)."""
    return F.array_sort(F.collect_set(_c(x).cast("bigint")))


def bitmap_union_count(x) -> Column:
    """Aggregate: count of the union — exact distinct count."""
    return F.size(bitmap_agg(x))


def bitmap_count(b) -> Column:
    return F.size(_c(b))


def orthogonal_bitmap_union_count(bm) -> Column:
    """Aggregate: count of the union of pre-built bitmap columns
    (Doris orthogonal_bitmap_union_count,
    be/src/exprs/aggregate/aggregate_function_orthogonal_bitmap.h).
    The reference exploits orthogonal tablet partitioning; in Spark the
    same two-level partial/final merge falls out of hash aggregation."""
    return F.size(bitmap_union_agg(bm))


def orthogonal_bitmap_intersect(bm, filter_col, values) -> Column:
    """Aggregate: per filter value v, union the bitmaps of rows where
    filter_col = v, then intersect those unions (Doris
    orthogonal_bitmap_intersect(bitmap, col, v1, v2, ...)). One
    conditional partial aggregate per value — a single shuffle, no
    self-joins."""
    branches = [bitmap_union_agg(F.when(_c(filter_col) == v, _c(bm))) for v in values]
    out = branches[0]
    for b in branches[1:]:
        out = F.array_intersect(out, b)
    return F.array_sort(out)


def orthogonal_bitmap_intersect_count(bm, filter_col, values) -> Column:
    """Aggregate: cardinality of orthogonal_bitmap_intersect."""
    return F.size(orthogonal_bitmap_intersect(bm, filter_col, values))


def bitmap_and(a, b) -> Column:
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def bitmap_or(a, b) -> Column:
    return F.array_sort(F.array_union(_c(a), _c(b)))


def bitmap_xor(a, b) -> Column:
    return F.array_sort(
        F.array_union(
            F.array_except(_c(a), _c(b)), F.array_except(_c(b), _c(a))
        )
    )


def bitmap_andnot(a, b) -> Column:
    return F.array_sort(F.array_except(_c(a), _c(b)))


def bitmap_contains(b, x) -> Column:
    return F.array_contains(_c(b), F.lit(x).cast("bigint") if not isinstance(x, Column) else x)


def bitmap_has_any(a, b) -> Column:
    return F.arrays_overlap(_c(a), _c(b))


def bitmap_has_all(a, b) -> Column:
    return F.size(F.array_except(_c(b), _c(a))) == 0


def bitmap_min(b) -> Column:
    return F.array_min(_c(b))


def bitmap_max(b) -> Column:
    return F.array_max(_c(b))


def bitmap_to_string(b) -> Column:
    return F.array_join(_c(b), ",")


def bitmap_from_string(s) -> Column:
    return F.array_sort(
        F.array_distinct(F.transform(F.split(_c(s), ","), lambda v: v.cast("bigint")))
    )


def sub_bitmap(b, offset, cardinality) -> Column:
    return F.slice(_c(b), offset + 1, cardinality)


def bitmap_to_array(b) -> Column:
    """Identity under this representation (bitmap IS a sorted array)."""
    return _c(b)


def bitmap_remove(b, x) -> Column:
    return F.array_remove(_c(b), F.lit(x) if not isinstance(x, Column) else x)


def bitmap_subset_in_range(b, lo, hi) -> Column:
    """Elements in [lo, hi) — Doris bitmap_subset_in_range."""
    return F.filter(_c(b), lambda v: (v >= F.lit(lo)) & (v < F.lit(hi)))


def bitmap_subset_limit(b, start, limit) -> Column:
    """First `limit` elements with value >= start (function_bitmap.cpp)."""
    return F.slice(F.filter(_c(b), lambda v: v >= F.lit(start)), 1, limit)


def bitmap_and_count(a, b) -> Column:
    return F.size(bitmap_and(a, b))


def bitmap_or_count(a, b) -> Column:
    return F.size(bitmap_or(a, b))


def bitmap_xor_count(a, b) -> Column:
    return F.size(bitmap_xor(a, b))


def bitmap_andnot_count(a, b) -> Column:
    return F.size(bitmap_andnot(a, b))


# --------------------------------------------------------------------- HLL


def hll_hash(x) -> Column:
    """Doris hll_hash(v): single-value HLL sketch (binary)."""
    return F.hll_sketch_agg(_c(x))  # used inside agg contexts


def hll_union_agg(sketch) -> Column:
    """Aggregate: merge HLL sketches (Doris hll_union / hll_union_agg)."""
    return F.hll_union_agg(_c(sketch))


def hll_cardinality(sketch) -> Column:
    return F.hll_sketch_estimate(_c(sketch))


def ndv(x) -> Column:
    """Doris ndv()/approx_count_distinct — HLL-backed estimate."""
    return F.approx_count_distinct(_c(x))


# ----------------------------------------------------------- QUANTILE_STATE


def quantile_union(x, accuracy: int = 10000) -> Column:
    """Doris quantile_union + quantile_percent collapse to
    percentile_approx over the raw values (sketch is internal)."""
    return _c(x)


def quantile_percent(x, p: float, accuracy: int = 10000) -> Column:
    return F.percentile_approx(_c(x), p, accuracy)
