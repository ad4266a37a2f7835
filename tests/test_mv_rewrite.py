"""Transparent MV rewrite (plans/mv_rewrite.py).

Reference: fe/fe-core/.../nereids/rules/exploration/mv/
MaterializedViewProjectAggregateRule.java (SPJG containment),
AggregateStrategies.java (sync rollup selection).
"""

from __future__ import annotations

import pytest

from doris_spark.plans.mv_rewrite import MVDef, try_rewrite

MV = MVDef.build(
    "orders_mv",
    "orders",
    dims=["o_orderpriority", "o_orderstatus"],
    measures={
        "cnt": "count(*)",
        "sum_price": "sum(o_totalprice)",
        "min_price": "min(o_totalprice)",
        "max_price": "max(o_totalprice)",
        "cnt_price": "count(o_totalprice)",
    },
)


def test_exact_dims_rewrite():
    out = try_rewrite(
        "SELECT o_orderpriority, count(*) AS n, sum(o_totalprice) AS total "
        "FROM orders GROUP BY o_orderpriority",
        [MV],
    )
    assert out is not None
    sql, name = out
    assert name == "orders_mv"
    assert "FROM orders_mv" in sql
    assert "sum(`cnt`) AS n" in sql
    assert "sum(`sum_price`) AS total" in sql


def test_rollup_subset_dims_with_where_and_avg():
    out = try_rewrite(
        "SELECT o_orderstatus, avg(o_totalprice) AS ap, min(o_totalprice) AS mn "
        "FROM orders WHERE o_orderpriority = '1-URGENT' "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus",
        [MV],
    )
    assert out is not None
    sql, _ = out
    assert "(sum(`sum_price`) / sum(`cnt_price`)) AS ap" in sql
    assert "min(`min_price`) AS mn" in sql
    assert "WHERE o_orderpriority = '1-URGENT'" in sql


def test_no_rewrite_on_unknown_aggregate_or_dim():
    # stddev is not derivable from the partials
    assert try_rewrite(
        "SELECT o_orderpriority, stddev(o_totalprice) FROM orders "
        "GROUP BY o_orderpriority",
        [MV],
    ) is None
    # filter on a non-dim column
    assert try_rewrite(
        "SELECT o_orderpriority, count(*) FROM orders "
        "WHERE o_custkey = 5 GROUP BY o_orderpriority",
        [MV],
    ) is None
    # group by a non-dim column
    assert try_rewrite(
        "SELECT o_custkey, count(*) FROM orders GROUP BY o_custkey", [MV]
    ) is None
    # distinct aggregate
    assert try_rewrite(
        "SELECT o_orderpriority, count(DISTINCT o_custkey) FROM orders "
        "GROUP BY o_orderpriority",
        [MV],
    ) is None
    # join / other table untouched
    assert try_rewrite("SELECT * FROM lineitem", [MV]) is None


def test_having_rewrite():
    out = try_rewrite(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority HAVING count(*) > 10 ORDER BY n DESC LIMIT 3",
        [MV],
    )
    assert out is not None
    sql, _ = out
    assert "HAVING sum(`cnt`) > 10" in sql
    assert "LIMIT 3" in sql


def test_engine_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from doris_spark.engine import Engine
    from doris_spark.session import register_views
    from doris_spark.streaming.mtmv import MaterializedView

    register_views(spark, "/root/testdata/sf0.001")
    eng = Engine(spark)
    base = spark.table("orders")

    mv = MaterializedView(
        spark,
        "orders_prio_mv",
        str(tmp_path),
        definition=lambda df: df.groupBy("o_orderpriority", "o_orderstatus").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("o_totalprice").alias("sum_price"),
        ),
        partition_col="o_orderpriority",
    )
    mv.refresh(base)
    eng.register_mv(
        "orders_prio_mv",
        "orders",
        dims=["o_orderpriority", "o_orderstatus"],
        measures={"cnt": "count(*)", "sum_price": "sum(o_totalprice)"},
        view=mv.read(),
    )

    q = (
        "SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    got = eng.sql(q)
    assert eng.last_mv_rewrite == "orders_prio_mv"
    plan = got._jdf.queryExecution().executedPlan().toString()
    # scan target is the MV parquet (its partial columns in ReadSchema),
    # not the base orders table
    assert "sum_price" in plan and "o_custkey" not in plan

    exp = spark.table("orders").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total")
    ).orderBy("o_orderstatus").collect()
    got_rows = got.collect()
    assert [(r.o_orderstatus, r.n) for r in got_rows] == [
        (r.o_orderstatus, r.n) for r in exp
    ]
    for g, e in zip(got_rows, exp):
        assert g.total == pytest.approx(e.total, rel=1e-9)
