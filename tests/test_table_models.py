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


def test_engine_facade(spark, sf_dir):
    """Engine: SQL entry point + keys-model-aware create_table/table."""
    import pytest
    from pyspark.sql import functions as F

    from doris_spark import Engine

    eng = Engine(spark)
    eng.register_parquet_dir(sf_dir)
    assert eng.sql("SELECT years_add(TIMESTAMP '2000-01-01', 1) AS t").collect()[0][
        "t"
    ].year == 2001

    raw = spark.createDataFrame(
        [(1, 1, "a", 10.0), (1, 2, "b", 20.0), (2, 1, "c", 5.0)],
        "id BIGINT, ver INT, name STRING, score DOUBLE",
    )
    eng.create_table(raw, "u_t", keys_type="UNIQUE_KEYS", keys=["id"], sequence_col="ver")
    got = {r["id"]: r["name"] for r in eng.table("u_t").collect()}
    assert got == {1: "b", 2: "c"}
    # sql() sees merged semantics
    assert eng.sql("SELECT count(*) AS n FROM u_t").collect()[0]["n"] == 2

    eng.create_table(
        raw, "a_t", keys_type="AGG_KEYS", keys=["id"],
        agg_spec={"score": "SUM", "name": "REPLACE"}, sequence_col="ver",
    )
    agg = {r["id"]: (r["score"], r["name"]) for r in eng.table("a_t").collect()}
    assert agg == {1: (30.0, "b"), 2: (5.0, "c")}

    with pytest.raises(ValueError):
        eng.create_table(raw, "bad", keys_type="UNIQUE_KEYS")
    eng.drop_table("u_t")
    eng.drop_table("a_t")


def test_partial_update(spark):
    from doris_spark.operators.table_models import partial_update

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id INT, name STRING, score DOUBLE",
    )
    # update carries only (id, score); one existing key gets an explicit
    # NULL (overwrite), one new key appears.
    updates = spark.createDataFrame(
        [(2, 99.0), (3, None), (4, 44.0)], "id INT, score DOUBLE"
    )
    got = {
        r["id"]: (r["name"], r["score"])
        for r in partial_update(base, updates, ["id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),    # untouched
        2: ("b", 99.0),    # score updated, name kept
        3: ("c", None),    # explicit NULL overwrites
        4: (None, 44.0),   # new key, unsupplied column NULL
    }


def test_partial_update_rejects_unknown_columns(spark):
    import pytest

    from doris_spark.operators.table_models import partial_update

    base = spark.createDataFrame([(1, 1.0)], "id INT, v DOUBLE")
    upd = spark.createDataFrame([(1, 2.0)], "id INT, nope DOUBLE")
    with pytest.raises(ValueError, match="nope"):
        partial_update(base, upd, ["id"])
