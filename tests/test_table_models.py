"""Table-model semantics re-verification — the reference's model-variant
rerun strategy (SURVEY §5: tpch_sf0.1_unique_p1 / tpcds_*_dup_without_key
re-run the same queries on different table models and require identical
answers). Here: the same aggregation computed (a) directly on clean data
and (b) through the UNIQUE_KEYS merge-on-read view over a version-polluted
copy must agree; likewise AGG_KEYS pre-aggregation vs direct groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from doris_spark.operators.table_models import agg_key_view, unique_key_view
from doris_spark.session import load_tables

def _agg_style(df):
    return (
        df.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            # rounded: double summation order differs between the two plans
            F.round(F.sum("o_totalprice"), 4).alias("total"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def test_unique_model_rerun_matches_dup(spark, sf_dir):
    """Pollute orders (PK = o_orderkey) with stale + updated versions; the
    merge-on-read view must reproduce exactly the final-version table.
    (lineitem's (orderkey, linenumber) is intentionally NOT unique in the
    fixture, so the upsert-model check uses orders.)"""
    o = load_tables(spark, sf_dir)["orders"]
    v0 = o.withColumn("__version", F.lit(0))
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("__version", F.lit(1))
    )
    stale = (
        o.filter(F.col("o_orderkey") % 10 == 1)
        .withColumn("o_totalprice", F.lit(-999.0))
        .withColumn("__version", F.lit(-1))
    )
    polluted = v0.unionByName(updates).unionByName(stale)
    mor = unique_key_view(polluted, keys=["o_orderkey"], sequence_col="__version").drop(
        "__version"
    )

    expected = (
        o.filter(F.col("o_orderkey") % 10 != 0)
        .unionByName(
            o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
                "o_totalprice", F.col("o_totalprice") * 2
            )
        )
    )
    got = [tuple(r) for r in _agg_style(mor).collect()]
    want = [tuple(r) for r in _agg_style(expected).collect()]
    assert got == want
    assert mor.count() == o.count()


def test_agg_model_matches_direct_groupby(spark, sf_dir):
    """AGG_KEYS pre-aggregation view == direct aggregation of raw rows,
    including a second-level rollup over the pre-aggregated table (the
    Doris rollup-selection property: aggregating the agg table gives the
    same answer as aggregating raw data)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    agg_tbl = agg_key_view(
        li.withColumn("__seq", F.monotonically_increasing_id()),
        keys=["l_returnflag", "l_linestatus", "l_suppkey"],
        agg_spec={"l_quantity": "SUM", "l_extendedprice": "MAX", "l_discount": "MIN"},
    )
    # roll the pre-agg up to (returnflag, linestatus)
    rolled = (
        agg_tbl.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.max("l_extendedprice").alias("mx"),
            F.min("l_discount").alias("mn"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    direct = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.max("l_extendedprice").alias("mx"),
            F.min("l_discount").alias("mn"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    got = [(r["l_returnflag"], r["l_linestatus"], round(r["sq"], 6), r["mx"], r["mn"]) for r in rolled.collect()]
    want = [(r["l_returnflag"], r["l_linestatus"], round(r["sq"], 6), r["mx"], r["mn"]) for r in direct.collect()]
    assert got == want
