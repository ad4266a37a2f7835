"""Partition/bucket layout — the Doris tablet model on Spark storage.

Reference: PartitionType.java:24-27 (RANGE/LIST/UNPARTITIONED) +
DistributionInfo.java:30-31 (HASH/RANDOM buckets); tablet hashing on write
be/src/exec/sink/tablet_sink_hash_partitioner.h; colocate-join property
nereids/properties/ChildrenPropertiesRegulator.java:395.

Spark mapping: `partitionBy` directories = RANGE/LIST partitions (partition
pruning at scan), `bucketBy` = HASH distribution. Two tables bucketed the
same way on the join key give a **colocate join**: SortMergeJoin with ZERO
Exchange on either side — at 100 TB this removes the dominant shuffle of
fact-fact joins. Verified by plan assertion in tests/test_layout.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    partition_cols: Sequence[str] = (),
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Write df as a managed bucketed table (CREATE TABLE ... DISTRIBUTED BY
    HASH(cols) BUCKETS n analog). sort_cols adds in-bucket ordering — the
    Doris short-key-index analog (enables per-bucket merge joins and better
    min/max pruning)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.saveAsTable(table)


def colocate_join_ready(spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With
    matching bucket counts Spark plans SortMergeJoin without shuffles."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, list(on))


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (plan-shape
    assertion helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
