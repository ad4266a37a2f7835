"""Generating TVFs (functions/tvf.py) and the Engine.sql macro layer
(plans/sql_macros.py)."""

from __future__ import annotations

import pytest

from doris_spark.plans.sql_macros import rewrite


# ---------------------------------------------------------------- TVFs


TVF_CASES = [
    ("SELECT * FROM explode_json_array_int('[1, 2, 3]')", [(1,), (2,), (3,)]),
    ("SELECT * FROM explode_json_array_int('[]')", []),
    ("SELECT * FROM explode_json_array_int_outer('[]')", [(None,)]),
    ("SELECT * FROM explode_json_array_double('[1.5, 2]')", [(1.5,), (2.0,)]),
    ("SELECT * FROM explode_json_array_string('[\"a\", 1]')", [("a",), ("1",)]),
    ("SELECT * FROM explode_json_array_json('[{\"x\": 1}, 2]')", [('{"x":1}',), ("2",)]),
    (
        "SELECT * FROM explode_json_object('{\"a\": 1, \"b\": \"s\"}')",
        [("a", "1"), ("b", '"s"')],
    ),
    ("SELECT * FROM json_each_text('{\"b\": \"s\"}')", [("b", "s")]),
    ("SELECT * FROM json_each_outer('{}')", [(None, None)]),
    ("SELECT * FROM explode_split('a,b,c', ',')", [("a",), ("b",), ("c",)]),
    ("SELECT * FROM explode_numbers(3)", [(0,), (1,), (2,)]),
    ("SELECT * FROM explode_numbers_outer(0)", [(None,)]),
    ("SELECT * FROM explode_bitmap(array(1, 2, 3))", [(1,), (2,), (3,)]),
    ("SELECT * FROM explode_map(map('a', 1, 'b', 2))", [("a", "1"), ("b", "2")]),
    ("SELECT * FROM explode_variant_array('[1, {\"y\": 2}]')", [("1",), ('{"y":2}',)]),
    ("SELECT * FROM unnest(array('x', 'y'))", [("x",), ("y",)]),
]


@pytest.mark.parametrize("sql,expected", TVF_CASES, ids=[c[0][14:60] for c in TVF_CASES])
def test_tvf(spark, sql, expected):
    got = [tuple(r) for r in spark.sql(sql).collect()]
    assert got == expected, (sql, got, expected)


def test_tvf_lateral(spark):
    rows = spark.sql(
        "SELECT t.id, e.v FROM VALUES (1, '[10, 20]'), (2, '[]') AS t(id, j), "
        "LATERAL explode_json_array_int_outer(t.j) e ORDER BY id, v"
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 10), (1, 20), (2, None)]


# ---------------------------------------------------------- macro layer


REWRITES = [
    ("SELECT ndv(x) FROM t", "SELECT approx_count_distinct(x) FROM t"),
    ("SELECT NDV(x) FROM t", "SELECT approx_count_distinct(x) FROM t"),
    ("SELECT sum0(x) FROM t", "SELECT coalesce(sum(x), 0) FROM t"),
    (
        "SELECT multi_distinct_count(a + b) FROM t",
        "SELECT count(DISTINCT a + b) FROM t",
    ),
    (
        # pairwise null filtering; all-zero weights render NaN (Doris)
        "SELECT avg_weighted(price, qty) FROM t",
        "SELECT (CASE WHEN sum(IF((price) IS NOT NULL, (qty), NULL)) = 0 "
        "AND count(IF((price) IS NOT NULL AND (qty) IS NOT NULL, 1, NULL)) > 0 "
        "THEN CAST('NaN' AS DOUBLE) "
        "ELSE sum((price) * (qty)) / "
        "sum(IF((price) IS NOT NULL, (qty), NULL)) END) FROM t",
    ),
    # nested calls rewrite inside-out
    (
        "SELECT ndv(sum0(x)) FROM t",
        "SELECT approx_count_distinct(coalesce(sum(x), 0)) FROM t",
    ),
    # string literals are untouched
    (
        "SELECT 'ndv(x)' AS s, ndv(y) FROM t",
        "SELECT 'ndv(x)' AS s, approx_count_distinct(y) FROM t",
    ),
    # lambda-first spellings flip to Spark hofs
    (
        "SELECT array_map(x -> x + 1, arr) FROM t",
        "SELECT transform(arr, x -> x + 1) FROM t",
    ),
    (
        "SELECT array_filter(x -> x > 0, arr) FROM t",
        "SELECT filter(arr, x -> x > 0) FROM t",
    ),
    # mask form (no lambda) keeps the registered SQL UDF name
    (
        "SELECT array_filter(arr, mask) FROM t",
        "SELECT array_filter(arr, mask) FROM t",
    ),
    (
        "SELECT retention(e = 'a', e = 'b') FROM t",
        "SELECT (CASE WHEN count(1) = 0 THEN CAST(NULL AS ARRAY<INT>) "
        "ELSE array(coalesce(CAST(bool_or(e = 'a') AS INT), 0), "
        "coalesce(CAST(bool_or(e = 'a') AND bool_or(e = 'b') AS INT), 0))"
        " END) FROM t",
    ),
]


@pytest.mark.parametrize("src,expected", REWRITES, ids=[r[0][7:50] for r in REWRITES])
def test_rewrite(src, expected):
    assert rewrite(src) == expected


def test_macros_execute(spark):
    from doris_spark.engine import Engine

    eng = Engine(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW mt AS "
        "SELECT * FROM VALUES (1, 10.0, 2.0, 'a'), (1, 20.0, 1.0, 'b'), "
        "(2, 30.0, 3.0, 'a') AS v(k, price, qty, ev)"
    )
    rows = eng.sql(
        "SELECT k, ndv(ev) AS nd, sum0(price) AS sp, avg_weighted(price, qty) AS aw, "
        "group_array(ev) AS ga, retention(ev = 'a', ev = 'b') AS ret "
        "FROM mt GROUP BY k ORDER BY k"
    ).collect()
    assert rows[0]["nd"] == 2 and rows[1]["nd"] == 1
    assert rows[0]["sp"] == 30.0
    assert abs(float(rows[0]["aw"]) - (10 * 2 + 20 * 1) / 3.0) < 1e-9
    assert sorted(rows[0]["ga"]) == ["a", "b"]
    assert list(rows[0]["ret"]) == [1, 1]
    assert list(rows[1]["ret"]) == [1, 0]

    lam = eng.sql(
        "SELECT array_map(x -> x * 2, array(1, 2)) AS m, "
        "array_first(x -> x > 1, array(1, 2, 3)) AS fi, "
        "array_last_index(x -> x = 1, array(1, 1, 2)) AS li, "
        "array_sortby(x -> -x, array(1, 3, 2)) AS sb"
    ).collect()[0]
    assert list(lam["m"]) == [2, 4]
    assert lam["fi"] == 2
    assert lam["li"] == 2
    assert list(lam["sb"]) == [3, 2, 1]

    bm = eng.sql(
        "SELECT bitmap_union_count(b) AS c, group_bitmap_xor(b) AS x FROM VALUES "
        "(array(1L, 2L)), (array(2L, 3L)), (array(2L)) AS v(b)"
    ).collect()[0]
    assert bm["c"] == 3
    assert list(bm["x"]) == [1, 2, 3]

    # hll_union_agg returns the BIGINT estimate directly (Doris
    # semantics); hll_union returns the merged sketch
    hll = eng.sql(
        "SELECT hll_union_agg(h) AS c, "
        "hll_cardinality(hll_union(h)) AS c2 FROM "
        "(SELECT hll_hash(CAST(id AS STRING)) h FROM range(50))"
    ).collect()[0]
    assert 40 <= hll["c"] <= 60
    assert hll["c"] == hll["c2"]


def test_topn_and_map_macros(spark):
    from doris_spark.engine import Engine

    eng = Engine(spark)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW tm AS SELECT * FROM VALUES "
        "('a'), ('a'), ('a'), ('b'), ('b'), ('c') AS v(x)"
    )
    r = eng.sql(
        "SELECT topn(x, 2) AS t, topn_array(x, 2) AS ta FROM tm"
    ).collect()[0]
    assert r["t"] == '{"a":3,"b":2}'
    assert list(r["ta"]) == ["a", "b"]

    r = eng.sql(
        "SELECT topn_weighted(x, w, 2) AS tw FROM VALUES "
        "('a', 1.0), ('b', 5.0), ('a', 1.0), ('c', 3.0) AS v(x, w)"
    ).collect()[0]
    assert list(r["tw"]) == ["b", "c"]

    r = eng.sql(
        "SELECT sum_map(ks, vs) AS s, min_map(ks, vs) AS mn, "
        "max_map(ks, vs) AS mx, avg_map(ks, vs) AS av, count_map(ks, vs) AS c "
        "FROM VALUES (array('x', 'y'), array(1.0, 10.0)), "
        "(array('x'), array(3.0)) AS v(ks, vs)"
    ).collect()[0]
    assert dict(r["s"]) == {"x": 4.0, "y": 10.0}
    assert dict(r["mn"]) == {"x": 1.0, "y": 10.0}
    assert dict(r["mx"]) == {"x": 3.0, "y": 10.0}
    assert dict(r["av"]) == {"x": 2.0, "y": 10.0}
    assert dict(r["c"]) == {"x": 2, "y": 1}


def test_dialect_subscript_skips_string_literals():
    # ADVICE r4: quoted ident[N] text (JSON paths, LIKE patterns) must
    # survive the 1-based-subscript rewrite untouched
    from doris_spark.plans.dialect import dialect

    s = dialect("SELECT get_json_object(j, '$.a[1]') FROM t")
    assert "'$.a[1]'" in s
    s = dialect("SELECT c FROM t WHERE c LIKE 'a[1]%'")
    assert "'a[1]%'" in s
    # real subscripts outside literals still rewrite
    s = dialect("SELECT arr[1] FROM t WHERE note = 'arr[2]'")
    assert "try_element_at(arr, 1)" in s and "'arr[2]'" in s


def test_dialect_element_at_map_column_key_preserved():
    # ADVICE r4: element_at(m, key_col) is a map lookup, not struct access
    from doris_spark.plans.dialect import dialect

    s = dialect("SELECT element_at(m, key_col) FROM t")
    assert "element_at(m, key_col)" in s


def test_dialect_quoted_alias_literal_aware():
    # ADVICE r7: AS inside a string literal must not be treated as a
    # single-quoted alias opener
    from doris_spark.plans.dialect import dialect

    s = dialect("SELECT concat('a AS ', 'b') FROM t")
    assert "'a AS '" in s and "'b'" in s and "`" not in s
    # genuine single-quoted aliases still rewrite
    s = dialect("SELECT 1 AS 'one'")
    assert "AS `one`" in s
