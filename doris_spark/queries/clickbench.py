"""ClickBench-shaped analytics suite over the events/documents fixtures.

The reference ships a ClickBench harness (tools/clickbench-tools/,
regression-test/pipeline/performance/run-clickbench.sh gates in
BASELINE.md); these are the same query shapes — full-scan counts,
filtered aggregates, NDV, top-K by traffic, time bucketing, JSON
property extraction, substring search — adapted to the driver's events
and documents tables. Each is a single declarative statement so
Catalyst plans the scan pruning/partial aggregation; the parquet scan
should show 1-3 column ReadSchema on every one of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doris_spark.queries import query
from doris_spark.session import load_tables


@query("cb_count", oracle="SELECT count(*) AS n FROM events")
def cb_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.agg(F.count("*").alias("n"))


@query(
    "cb_filtered_agg",
    oracle="""
SELECT count(*) AS n, round(sum(value), 4) AS sv, round(avg(value), 6) AS av
FROM events WHERE event_type = 'click'
""",
)
def cb_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.filter(F.col("event_type") == "click").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sv"),
        F.round(F.avg("value"), 6).alias("av"),
    )


@query("cb_ndv_users", oracle="SELECT count(DISTINCT user_id) AS u FROM events")
def cb_ndv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.agg(F.countDistinct("user_id").alias("u"))


@query(
    "cb_minmax_ts",
    oracle="""
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS mn,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS mx FROM events
""",
)
def cb_minmax_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return ev.agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("mn"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("mx"),
    )


@query(
    "cb_by_type",
    oracle="""
SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type
""",
)
def cb_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
    )


@query(
    "cb_top_users",
    oracle="""
SELECT user_id, count(*) AS n, round(sum(value), 4) AS sv
FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
""",
)
def cb_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


@query(
    "cb_value_quantiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def cb_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


@query(
    "cb_hourly",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS h, count(*) AS n,
       count(DISTINCT user_id) AS u
FROM events GROUP BY date_trunc('hour', ts) ORDER BY h LIMIT 24
""",
)
def cb_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("ht"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("u"))
        .select(
            F.date_format("ht", "yyyy-MM-dd HH:mm:ss").alias("h"), "n", "u"
        )
        .orderBy("h")
        .limit(24)
    )


@query(
    "cb_json_prop",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS kb,
       count(*) AS n
FROM events
WHERE json_extract(props, '$.k') IS NOT NULL
GROUP BY kb ORDER BY kb
""",
)
def cb_json_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("kb")
        )
        .filter(F.col("kb").isNotNull())
        .groupBy("kb")
        .agg(F.count("*").alias("n"))
        .orderBy("kb")
    )


@query(
    "cb_substring_search",
    oracle="""
SELECT lang, count(*) AS n
FROM documents WHERE text LIKE '%merge%'
GROUP BY lang ORDER BY n DESC, lang
""",
)
def cb_substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.filter(F.col("text").contains("merge"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "lang")
    )
