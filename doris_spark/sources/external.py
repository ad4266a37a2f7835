"""External-system scans: JDBC and Elasticsearch.

Reference analogs: JdbcScan (be/src/exec/operator/jdbc_scan_operator.h,
be/src/exec/scan/jdbc_scanner.cpp) and EsScan with DSL pushdown
(fe/fe-core/.../datasource/es/, be/src/exec/connector/).

Spark-first design: both are thin wrappers over Spark's own connector
data sources — predicate/column pushdown happens inside the connector
(JDBC pushes filters into the remote WHERE clause; the ES connector
translates filters to query DSL). The wrapper's job is the *parallel
scan contract*: a JDBC read without partitioning options is a single
task no matter the cluster size, so `read_jdbc_scan` makes the
partition-column split explicit, mirroring the reference's per-BE
scan-range assignment.

Neither a JDBC driver jar nor the ES connector ships in this container;
wiring tests assert the source path reaches Spark's data-source
resolution (tests/test_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_scan(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int = 1,
    **options: str,
) -> DataFrame:
    """JdbcScan: external RDBMS table as a DataFrame.

    With `partition_column` + bounds, Spark issues `num_partitions`
    range-sliced queries in parallel (the scale path — one executor task
    per slice); without them the scan is a single task (fine only for
    small dimension tables, which should then be broadcast at join time).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_es_scan(
    spark: SparkSession,
    nodes: str,
    resource: str,
    query: str | None = None,
    **options: str,
) -> DataFrame:
    """EsScan: Elasticsearch index as a DataFrame via the public
    `org.elasticsearch.spark.sql` connector (one Spark partition per ES
    shard; filters pushed down as query DSL — the same pushdown surface
    as the reference's esquery()). `query` is an optional raw DSL string
    (`es.query`)."""
    reader = (
        spark.read.format("org.elasticsearch.spark.sql")
        .option("es.nodes", nodes)
        .option("es.resource", resource)
    )
    if query is not None:
        reader = reader.option("es.query", query)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
