"""Layout/scale-path assertions: bucketed co-located joins must plan with
no shuffle; salted joins must preserve join results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from doris_spark.operators.skew import salted_join
from doris_spark.session import load_tables
from doris_spark.sources.layout import colocate_join_ready, has_shuffle, save_bucketed


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    spark.sql("CREATE DATABASE IF NOT EXISTS colo")
    t = load_tables(spark, sf_dir)
    save_bucketed(
        t["orders"], "colo.orders_b", ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"]
    )
    save_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "colo.lineitem_b",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    yield "colo"
    spark.sql("DROP DATABASE colo CASCADE")


def test_colocate_join_has_no_shuffle(spark, sf_dir, warehouse):
    joined = colocate_join_ready(spark, "colo.orders_b", "colo.lineitem_b", ["o_orderkey"])
    agg_free = joined.select("o_orderkey", "l_quantity")
    assert not has_shuffle(agg_free), "bucketed join must not shuffle"
    # and it returns the same rows as the plain join
    t = load_tables(spark, sf_dir)
    plain = t["orders"].join(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_avoids_shuffle(spark, warehouse):
    agg = spark.table("colo.orders_b").groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert not has_shuffle(agg), "group-by on the bucket key must not shuffle"


def test_salted_join_matches_plain(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    sup = t["supplier"]
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    salted = (
        salted_join(li, sup.withColumnRenamed("s_suppkey", "l_suppkey"), ["l_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("q"))
    )
    got = {(r["s_name"]): (r["n"], r["q"]) for r in salted.collect()}
    want = {(r["s_name"]): (r["n"], r["q"]) for r in plain.collect()}
    assert got == want
