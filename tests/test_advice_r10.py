"""Regression tests for the round-9 ADVICE findings (fixed in round 10).

1. plans.dialect._rewrite_right_semi_anti: a FROM chain containing TWO
   RIGHT SEMI/ANTI joins restarts matching on the mutated string after
   each rewrite instead of swapping at stale offsets.
2. plans.dialect _is_bool_sub: IS [NOT] TRUE/FALSE inside a string
   literal is data, not an operator — left untouched.
3. tools.ref_suite_runner multi-statement split: quote-aware (a ';'
   inside a string literal must not split the file).
4. tools.ref_parity._eval_list_builders: '**' (power) rejected and
   operand magnitude bounded — no hang/OOM from untrusted fixtures.
5. tools.ref_parity statement-scoped type hints: skipped when the
   statement contains a subquery (second SELECT/FROM), so a subquery
   column sharing a name with the outer table keeps its own type.
"""

from __future__ import annotations

import re
import sys
import time
from pathlib import Path

TOOLS = str(Path(__file__).resolve().parents[1] / "tools")
if TOOLS not in sys.path:
    sys.path.insert(0, TOOLS)


def test_right_semi_double_chain_rewrites_and_runs(spark):
    """Two RIGHT SEMI joins in one left-deep FROM chain: the rewrite
    must restart on the mutated string; the result must match the
    reference semantics (each RIGHT SEMI keeps the RIGHT side's rows
    that found a match)."""
    from doris_spark.plans.dialect import _rewrite_right_semi_anti

    spark.range(0, 5).createOrReplaceTempView("rsa_a")    # 0..4
    spark.range(3, 8).createOrReplaceTempView("rsa_b")    # 3..7
    spark.range(4, 10).createOrReplaceTempView("rsa_c")   # 4..9
    sql = (
        "SELECT id FROM rsa_a right semi join rsa_b "
        "on rsa_a.id = rsa_b.id right semi join rsa_c "
        "on rsa_b.id = rsa_c.id ORDER BY id"
    )
    out = _rewrite_right_semi_anti(sql)
    assert not re.search(r"(?i)\bright\s+(semi|anti)\b", out), out
    # balanced parens — the stale-offset bug produced mangled nesting
    assert out.count("(") == out.count(")"), out
    # semantics: a⋉b -> {3,4}; (a⋉b)⋉c keeps c-rows matched -> {4}
    rows = [r[0] for r in spark.sql(out).collect()]
    assert rows == [4], (out, rows)


def test_right_semi_then_anti_chain(spark):
    from doris_spark.plans.dialect import _rewrite_right_semi_anti

    spark.range(0, 5).createOrReplaceTempView("rsa_a")
    spark.range(3, 8).createOrReplaceTempView("rsa_b")
    spark.range(4, 10).createOrReplaceTempView("rsa_c")
    sql = (
        "SELECT id FROM rsa_a right semi join rsa_b "
        "on rsa_a.id = rsa_b.id right anti join rsa_c "
        "on rsa_b.id = rsa_c.id ORDER BY id"
    )
    out = _rewrite_right_semi_anti(sql)
    assert not re.search(r"(?i)\bright\s+(semi|anti)\b", out), out
    assert out.count("(") == out.count(")"), out
    # a⋉b={3,4}; c rows WITHOUT a match in {3,4} -> {5,6,7,8,9}
    rows = [r[0] for r in spark.sql(out).collect()]
    assert rows == [5, 6, 7, 8, 9], (out, rows)


def test_is_true_inside_string_literal_untouched():
    from doris_spark.plans.dialect import dialect

    out = dialect("SELECT 'x IS TRUE' AS s, 1 IS TRUE AS b FROM t")
    assert "'x IS TRUE'" in out, out
    # the real operator outside the literal IS rewritten
    assert re.search(r"(?i)CAST\(\s*1\s+AS BOOLEAN\)", out), out


def test_is_false_inside_double_quoted_literal_untouched():
    from doris_spark.plans.dialect import _lit_spans  # noqa: F401
    from doris_spark.plans.dialect import dialect

    out = dialect('SELECT "y IS NOT FALSE" AS s FROM t')
    assert "y IS NOT FALSE" in out, out
    assert "CAST" not in out.upper() or "BOOLEAN" not in out.upper(), out


def test_suite_runner_split_is_quote_aware():
    import ref_parity as rp

    stmts = rp._split_statements(
        "select ';' as a;\nselect 'b;c' as b;  select 1"
    )
    assert len(stmts) == 3, stmts
    assert "';'" in stmts[0] and "'b;c'" in stmts[1]
    # and the runner actually uses the quote-aware splitter
    src = (Path(TOOLS) / "ref_suite_runner.py").read_text()
    assert "rp._split_statements" in src
    assert 'nb.split(";")' not in src


def test_list_builder_rejects_power_and_huge_operands():
    import ref_parity as rp

    groovy = (
        'def vals = []\n'
        'for (i in 1..2) { vals.add("(${9**9**9})") }\n'
        'sql "INSERT INTO t VALUES " + vals.join(", ")\n'
    )
    t0 = time.time()
    out = rp._eval_list_builders(groovy)
    assert time.time() - t0 < 5.0
    assert "9**9**9" not in out or "INSERT INTO t VALUES (" not in out
    # huge literals are bounded too
    groovy2 = (
        'def vals = []\n'
        'for (i in 1..1) { vals.add("(${9999999999999999 * '
        '9999999999999999})") }\n'
        'sql "INSERT INTO t VALUES " + vals.join(", ")\n'
    )
    out2 = rp._eval_list_builders(groovy2)
    assert "99999999999999980000" not in out2


def test_type_hint_scope_skips_subquery_statements():
    """A statement with an IN-subquery must NOT pin the outer table's
    declared types (the subquery's same-named column may differ)."""
    import ref_parity as rp
    from doris_spark.plans import type_hints as th

    rp._TABLE_META["th_outer_t"] = {
        "cols": [("k2", "smallint", False)], "seq_col": None,
    }
    # the hazard needs an actual name collision: the subquery's table
    # declares the SAME column name with a DIFFERENT type
    rp._TABLE_META["other_t"] = {
        "cols": [("k2", "int", False)], "seq_col": None,
    }
    try:
        captured = {}

        def fake_run(eng, sql, expected, ordered, applicable,
                     td_applicable):
            captured["scope"] = dict(th.SCOPED)
            return True

        orig = rp._run_case_scoped
        rp._run_case_scoped = fake_run
        try:
            rp.run_case(
                None,
                "SELECT k2 FROM th_outer_t WHERE k2 IN "
                "(SELECT k2 FROM other_t)",
                [], False,
            )
            sub_scope = captured.get("scope")
            rp.run_case(None, "SELECT k2 FROM th_outer_t", [], False)
            plain_scope = captured.get("scope")
        finally:
            rp._run_case_scoped = orig
        assert "k2" not in sub_scope, "subquery statement was scoped"
        assert plain_scope.get("k2") == "smallint", (
            "single-table scoping regressed"
        )
    finally:
        rp._TABLE_META.pop("th_outer_t", None)
        rp._TABLE_META.pop("other_t", None)


def test_codebook_disk_sidecar_cross_process_reuse(spark, tmp_path):
    """VERDICT r9 ask #5: vec_ivf_knn's ad-hoc training must not re-run
    Lloyd in a COLD process. The codebook persists to a tempdir sidecar
    keyed by content (file size+mtime + canonicalized plan + params);
    an empty in-memory cache (= fresh interpreter) reloads it with zero
    Spark jobs, and a key mismatch (different corpus at the same hash
    path) retrains instead of returning a stale codebook."""
    import json

    from doris_spark.operators import vector as V

    p = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, [float(i % 7), float(i % 5)]) for i in range(1, 40)],
        "id BIGINT, emb ARRAY<DOUBLE>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    cb1 = V.train_ivf_codebook(df, "emb", "id", n_centroids=4, iters=1)
    # fresh interpreter simulation: drop the in-memory cache
    V._CODEBOOK_CACHE.clear()
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    cb2 = V.train_ivf_codebook(
        spark.read.parquet(p), "emb", "id", n_centroids=4, iters=1
    )
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert cb2 == cb1
    # training (iters=1) needs >=2 jobs (seed collect + assignment agg);
    # the cached path may pay 1 for parquet schema inference, never more
    assert after - before <= 1, (
        f"disk-cached codebook load ran training jobs ({after - before})"
    )
    # key-mismatch safety: corrupt the sidecar's stored key -> retrain
    sidecars = []
    import glob as _glob
    import tempfile as _tf

    for f in _glob.glob(
        str(Path(_tf.gettempdir()) / "doris_spark_cb_*.json")
    ):
        d = json.loads(Path(f).read_text())
        if d["cb"] and [list(x) for x in map(list, cb1)] == [
            [c, v] for c, v in d["cb"]
        ]:
            sidecars.append(f)
    assert sidecars, "no sidecar written for the trained codebook"
    bad = {"key": "NOT-THE-KEY", "cb": [[0, [9.9, 9.9]]]}
    Path(sidecars[0]).write_text(json.dumps(bad))
    V._CODEBOOK_CACHE.clear()
    cb3 = V.train_ivf_codebook(
        spark.read.parquet(p), "emb", "id", n_centroids=4, iters=1
    )
    assert cb3 == cb1, "key-mismatched sidecar must retrain, not reuse"
