"""Query registry: the engine's public correctness surface.

Each entry registers a (name, builder, oracle_sql) triple. Builders take
(spark, sf_dir) and return a DataFrame; oracle_sql is equivalent ANSI SQL for
DuckDB over the same parquet fixtures (driver contract in __spark_entry__.py).
Column names are aliased identically on both sides — the driver hashes values
after sorting columns by name.

A query with oracle=None gets the driver's weaker rows-only check (used for
genuinely non-SQL-expressible ops, e.g. MinHash LSH dedup).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def stable_key(sf_dir: str) -> str:
    """Content-stable digest of a fixture dir for cached-artifact paths
    (persisted ANN / postings indexes, MV storage). Python's hash() is
    process-salted, so it forced every new process to rebuild; md5 of
    the path keeps warm runs warm across processes."""
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:16]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def merge_sorted(df: DataFrame, *cols) -> DataFrame:
    """Final ORDER BY for BOUNDED result sets — single merge partition
    (the Doris ResultSink merge-exchange analog: the coordinator merges
    for the final ORDER BY) instead of a range exchange, whose
    bound-sampling pass costs a full extra job and exchange.

    ONLY for results bounded by fixed group-key cardinality (status
    flags, nations, brands, years, buckets, ...) with algebraic
    aggregates: those stay a few hundred rows at ANY scale factor, so a
    single sorted partition is the scale-correct plan. Results that grow
    with the data (per-customer, per-document, per-order rows) must keep
    the range-partitioned global sort. Time-window keys (hourly
    tumbling/sliding buckets) count as bounded here because cardinality
    scales with the RETENTION WINDOW's span (fixture: a fixed range;
    production: the TTL), not with row volume — revisit if a consumer
    ever sorts unbounded-history windows."""
    return df.coalesce(1).sortWithinPartitions(*cols)


def year_between(col, lo: int, hi: Optional[int] = None):
    """Pushdown-friendly year predicate: `year(col) in [lo, hi]` expressed
    as a half-open timestamp range. Plain comparisons reach the parquet
    scan's PushedFilters (row-group/page min-max skipping — the lever at
    100 TB), where a `year(col) = Y` filter pushes nothing but IsNotNull
    (guide §6, verified in plans/r12). Exact for every non-null
    timestamp; NULLs fail both forms identically."""
    from pyspark.sql import functions as F

    hi = lo if hi is None else hi
    c = F.col(col) if isinstance(col, str) else col
    return (c >= F.lit(f"{lo}-01-01")) & (c < F.lit(f"{hi + 1}-01-01"))


def query(name: str, oracle: Optional[str] = None):
    """Decorator: register a query builder and its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: fills QUERIES/ORACLES)."""
    from doris_spark.queries import (  # noqa: F401
        advanced,
        analytics,
        clickbench,
        doris_fns,
        events,
        extras,
        ssb,
        text,
        tpcds_like,
        tpch,
        vector,
    )
