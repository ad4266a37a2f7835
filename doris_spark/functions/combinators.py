"""AGG_STATE combinators: explicit _state / _union / _merge callables.

Reference analogs: AGG_STATE type (be/src/core/data_type/data_type_agg_state.h)
and the combinator suffixes `_state`, `_union`, `_merge`
(be/src/exprs/aggregate/aggregate_function_combinator.h,
aggregate_function_state_union.h, aggregate_function_state_merge.h):
`f_state(x)` yields a partial-aggregate value, `f_union(state)` merges
states into a state, `f_merge(state)` finalizes states into f's result.

Spark-first design: a state is a typed STRUCT column (Spark's own partial
aggregation stays internal; this surface is for *stored* states — the
Doris pattern of an AGG_STATE column in an AGG_KEYS table that is rolled
up further at query time). Struct fields keep exact types (decimal sums
stay decimal), so union/merge are reorder-insensitive for the supported
aggregates; finalization casts are the caller's choice.

Supported: sum, count, min, max, avg (sum+count struct). All are native
column expressions — codegen, no UDFs, mergeable across any regrouping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# -- sum ---------------------------------------------------------------
def sum_state(x) -> Column:
    return F.struct(F.sum(_c(x)).alias("s"))


def sum_union(st) -> Column:
    return F.struct(F.sum(_c(st).getField("s")).alias("s"))


def sum_merge(st) -> Column:
    return F.sum(_c(st).getField("s"))


# -- count -------------------------------------------------------------
def count_state(x) -> Column:
    return F.struct(F.count(_c(x)).alias("n"))


def count_union(st) -> Column:
    return F.struct(F.sum(_c(st).getField("n")).alias("n"))


def count_merge(st) -> Column:
    return F.sum(_c(st).getField("n"))


# -- min / max ---------------------------------------------------------
def min_state(x) -> Column:
    return F.struct(F.min(_c(x)).alias("v"))


def min_union(st) -> Column:
    return F.struct(F.min(_c(st).getField("v")).alias("v"))


def min_merge(st) -> Column:
    return F.min(_c(st).getField("v"))


def max_state(x) -> Column:
    return F.struct(F.max(_c(x)).alias("v"))


def max_union(st) -> Column:
    return F.struct(F.max(_c(st).getField("v")).alias("v"))


def max_merge(st) -> Column:
    return F.max(_c(st).getField("v"))


# -- avg (composite state) ---------------------------------------------
def avg_state(x) -> Column:
    return F.struct(F.sum(_c(x)).alias("s"), F.count(_c(x)).alias("n"))


def avg_union(st) -> Column:
    return F.struct(
        F.sum(_c(st).getField("s")).alias("s"),
        F.sum(_c(st).getField("n")).alias("n"),
    )


def avg_merge(st) -> Column:
    """Finalize as double (exact decimal sum divided once at the end)."""
    return F.sum(_c(st).getField("s")).cast("double") / F.sum(_c(st).getField("n"))
