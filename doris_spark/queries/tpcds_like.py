"""TPC-DS-shaped analytics suite adapted to the fixture star schema.

The reference ships a full TPC-DS harness (tools/tpcds-tools/, perf gate
regression-test/pipeline/performance/run-tpcds.sh in BASELINE.md). The
fixture schema is TPC-H-ish, so these reproduce the TPC-DS query *shapes*
— year-over-year ratios (q74), cumulative reports (q51), per-group
contribution shares with QUALIFY-style top-k (q67), customer bucketing
(q34), channel intersection (q38), decile segmentation, rollup reports
with GROUPING flags (q18/q22/q27) — on the tables we have.

Scale notes: every query is a single declarative plan. Dimension joins
broadcast (nation/region/part are bounded); fact-side aggregates are
partial+final (map-side combine); window functions partition on the
grouped key so the shuffle feeding the window is the same one the
aggregate produced (Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from doris_spark.queries import query
from doris_spark.session import load_tables


@query(
    "ds_yoy_brand",
    oracle="""
WITH yr AS (
  SELECT p_brand, year(l_shipdate) AS yr,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, year(l_shipdate)
)
SELECT p_brand, yr, rev,
       round(rev / lag(rev) OVER (PARTITION BY p_brand ORDER BY yr), 6) AS yoy
FROM yr ORDER BY p_brand, yr
""",
)
def ds_yoy_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 shape: year-over-year revenue ratio per brand.

    The lag window partitions on p_brand — the same key the aggregate
    grouped on — so no extra shuffle is needed between agg and window."""
    t = load_tables(spark, sf_dir)
    yr = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.year("l_shipdate").alias("yr"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("rev"))
    )
    w = Window.partitionBy("p_brand").orderBy("yr")
    return yr.select(
        "p_brand", "yr", "rev",
        F.round(F.col("rev") / F.lag("rev").over(w), 6).alias("yoy"),
    ).orderBy("p_brand", "yr")


@query(
    "ds_rollup_report",
    oracle="""
SELECT coalesce(n_name, 'ALL') AS nation,
       coalesce(c_mktsegment, 'ALL') AS segment,
       CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS BIGINT) AS gid,
       count(*) AS orders_cnt,
       round(sum(o_totalprice), 4) AS rev,
       round(avg(o_totalprice), 6) AS avg_rev
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE n_nationkey < 5
GROUP BY ROLLUP (n_name, c_mktsegment)
ORDER BY gid, nation, segment
""",
)
def ds_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q18/q27 shape: multi-level ROLLUP report with GROUPING flags
    (reference: grouping sets rewrite in nereids RollupToGroupingSets)."""
    t = load_tables(spark, sf_dir)
    j = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_nationkey") < 5)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    g = j.rollup("n_name", "c_mktsegment").agg(
        F.count("*").alias("orders_cnt"),
        F.round(F.sum("o_totalprice"), 4).alias("rev"),
        F.round(F.avg("o_totalprice"), 6).alias("avg_rev"),
        (F.grouping("n_name") * 2 + F.grouping("c_mktsegment")).cast("bigint").alias("gid"),
    )
    return g.select(
        F.coalesce("n_name", F.lit("ALL")).alias("nation"),
        F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
        "gid", "orders_cnt", "rev", "avg_rev",
    ).orderBy("gid", "nation", "segment")


@query(
    "ds_customer_buckets",
    oracle="""
WITH oc AS (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
)
SELECT CASE WHEN cnt <= 5 THEN 'a_1_5'
            WHEN cnt <= 10 THEN 'b_6_10'
            WHEN cnt <= 20 THEN 'c_11_20'
            ELSE 'd_20_plus' END AS bucket,
       count(*) AS customers,
       CAST(min(cnt) AS BIGINT) AS min_orders,
       CAST(max(cnt) AS BIGINT) AS max_orders
FROM oc GROUP BY bucket ORDER BY bucket
""",
)
def ds_customer_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: per-customer order-count segmentation."""
    t = load_tables(spark, sf_dir)
    oc = t["orders"].groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    bucket = (
        F.when(F.col("cnt") <= 5, "a_1_5")
        .when(F.col("cnt") <= 10, "b_6_10")
        .when(F.col("cnt") <= 20, "c_11_20")
        .otherwise("d_20_plus")
    )
    return (
        oc.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("customers"),
            F.min("cnt").cast("bigint").alias("min_orders"),
            F.max("cnt").cast("bigint").alias("max_orders"),
        )
        .orderBy("bucket")
    )


@query(
    "ds_channel_share",
    oracle="""
WITH d AS (
  SELECT event_type, isodow(ts) AS dow, count(*) AS n
  FROM events GROUP BY event_type, isodow(ts)
)
SELECT event_type, CAST(dow AS INT) AS dow, n,
       round(n / sum(n) OVER (PARTITION BY event_type), 6) AS share
FROM d ORDER BY event_type, dow
""",
)
def ds_channel_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q71 shape: per-channel share-of-traffic by day-of-week.
    Spark weekday() is 0=Monday; DuckDB isodow is 1=Monday — offset by 1."""
    ev = load_tables(spark, sf_dir)["events"]
    d = ev.groupBy(
        "event_type", (F.weekday("ts") + 1).cast("int").alias("dow")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    return d.select(
        "event_type", "dow", "n",
        F.round(F.col("n") / F.sum("n").over(w), 6).alias("share"),
    ).orderBy("event_type", "dow")


@query(
    "ds_cross_channel_customers",
    oracle="""
SELECT count(*) AS n FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
) t
""",
)
def ds_cross_channel_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38 shape: customers present in BOTH channels (INTERSECT =
    left-semi after distinct; Catalyst plans it as an aggregate + semi join)."""
    o = load_tables(spark, sf_dir)["orders"]
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op).agg(F.count("*").alias("n"))


@query(
    "ds_cumulative_monthly",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         round(sum(o_totalprice), 4) AS rev,
         count(*) AS orders_cnt
  FROM orders GROUP BY date_trunc('month', o_orderdate)
)
SELECT mon, rev, orders_cnt,
       round(sum(rev) OVER (ORDER BY mon ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_rev,
       CAST(row_number() OVER (ORDER BY mon) AS BIGINT) AS month_seq
FROM m ORDER BY mon
""",
)
def ds_cumulative_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: monthly revenue + running cumulative total.

    The unpartitioned window runs on the (small) aggregated monthly series, not
    the fact table — the 100 TB scan collapses to <=120 month rows before
    any single-partition window executes."""
    o = load_tables(spark, sf_dir)["orders"]
    # Spark's date_trunc yields TIMESTAMP; cast to DATE to match the
    # oracle (DuckDB date_trunc on a DATE stays DATE).
    m = o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("mon")).agg(
        F.round(F.sum("o_totalprice"), 4).alias("rev"),
        F.count("*").alias("orders_cnt"),
    )
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ws = Window.orderBy("mon")
    return m.select(
        "mon", "rev", "orders_cnt",
        F.round(F.sum("rev").over(w), 4).alias("cum_rev"),
        F.row_number().over(ws).cast("bigint").alias("month_seq"),
    ).orderBy("mon")


@query(
    "ds_decile_spend",
    oracle="""
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 4) AS tot
  FROM orders GROUP BY o_custkey
), dec AS (
  SELECT o_custkey, tot,
         ntile(10) OVER (ORDER BY tot DESC, o_custkey) AS d
  FROM spend
)
SELECT CAST(d AS INT) AS decile, count(*) AS n,
       round(sum(tot), 4) AS total_spend,
       round(min(tot), 4) AS min_spend,
       round(max(tot), 4) AS max_spend
FROM dec GROUP BY d ORDER BY d
""",
)
def ds_decile_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile segmentation of customer lifetime spend (ntile; ties broken
    by custkey so bucket assignment is deterministic)."""
    o = load_tables(spark, sf_dir)["orders"]
    spend = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 4).alias("tot"))
    w = Window.orderBy(F.desc("tot"), "o_custkey")
    dec = spend.select("tot", F.ntile(10).over(w).cast("int").alias("decile"))
    return (
        dec.groupBy("decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("tot"), 4).alias("total_spend"),
            F.round(F.min("tot"), 4).alias("min_spend"),
            F.round(F.max("tot"), 4).alias("max_spend"),
        )
        .orderBy("decile")
    )


@query(
    "ds_brand_type_topk",
    oracle="""
WITH t AS (
  SELECT p_brand, p_type, round(sum(l_extendedprice), 4) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_type
)
SELECT p_brand, p_type, rev,
       round(rev / sum(rev) OVER (PARTITION BY p_brand), 6) AS share,
       CAST(rank() OVER (PARTITION BY p_brand ORDER BY rev DESC, p_type) AS BIGINT) AS rk
FROM t
QUALIFY rk <= 3
ORDER BY p_brand, rk, p_type
""",
)
def ds_brand_type_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: contribution share + top-3 types per brand
    (QUALIFY = post-window filter; Catalyst pushes the rank limit via
    InferWindowGroupLimit so each partition keeps only its top rows)."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("rev"))
    )
    wshare = Window.partitionBy("p_brand")
    wrank = Window.partitionBy("p_brand").orderBy(F.desc("rev"), "p_type")
    return (
        agg.select(
            "p_brand", "p_type", "rev",
            F.round(F.col("rev") / F.sum("rev").over(wshare), 6).alias("share"),
            F.rank().over(wrank).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
        .orderBy("p_brand", "rk", "p_type")
    )


@query(
    "ds_returned_ratio",
    oracle="""
SELECT n_name,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END)
             / sum(l_extendedprice), 6) AS ret_ratio,
       count(*) AS line_cnt
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY ret_ratio DESC, n_name
LIMIT 10
""",
)
def ds_returned_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns-analysis shape (TPC-DS catalog_returns family): per supplier
    nation, ratio of returned revenue to total revenue, top 10."""
    t = load_tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    ret = F.sum(F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")))
    return (
        j.groupBy("n_name")
        .agg(
            F.round(ret / F.sum("l_extendedprice"), 6).alias("ret_ratio"),
            F.count("*").alias("line_cnt"),
        )
        .orderBy(F.desc("ret_ratio"), "n_name")
        .limit(10)
    )


@query(
    "ds_monthly_active_users",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', ts) AS mon, count(DISTINCT user_id) AS mau
  FROM events GROUP BY date_trunc('month', ts)
)
SELECT mon, mau,
       round(mau / lag(mau) OVER (ORDER BY mon), 6) AS mom_ratio
FROM m ORDER BY mon
""",
)
def ds_monthly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly active users + month-over-month ratio (distinct agg feeding
    an ordered lag window on the collapsed monthly series)."""
    ev = load_tables(spark, sf_dir)["events"]
    m = ev.groupBy(F.date_trunc("month", "ts").cast("date").alias("mon")).agg(
        F.countDistinct("user_id").alias("mau")
    )
    w = Window.orderBy("mon")
    return m.select(
        "mon", "mau",
        F.round(F.col("mau") / F.lag("mau").over(w), 6).alias("mom_ratio"),
    ).orderBy("mon")
