"""TPC-DS sf1 / TPC-H sf0.1: engine vs DuckDB value parity on
IDENTICAL data (--suite tpch flips to tpch_sf0.1_p1).

The reference's tpcds_sf1_p1 goldens were produced from the OFFICIAL
TPC dsdgen (tools/tpcds-tools/bin/build-tpcds-tools.sh downloads
TPC-DS_Tools_v3.2.0). DuckDB's bundled dsdgen is spec-conformant but
NOT byte-identical to it (verified: DuckDB running q01 on its own
generated sf1 data returns 'AAAAAAAAAACJAAAA' where the reference
golden has 'AAAAAAAAAAAKAAAA' — the divergence is in the data pool,
not any engine). With no network access to the official generator,
golden bytes are unreachable for data-dependent rows.

So this harness proves the stronger *portable* claim: for every
tpcds_sf1_p1/sql/q*.sql (the reference's own query text), the engine
and DuckDB — two independent SQL implementations — produce the SAME
result on the SAME official-spec sf1 dataset (DuckDB dsdgen), compared
as canonicalized sorted row-sets (7-significant-digit numeric
tolerance, ISO datetime instants).

Usage: python tools/tpc_duck_parity.py [--suite tpch|tpcds] [qNN ...]
Env: TPCDS_SKIP_LOAD=1 reuses the already-loaded warehouse DB.
Writes RS_OUT (default /tmp/tpcds_duck_parity.json).
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --suite tpch flips to the TPC-H sf0.1 suite (same portable claim:
# DuckDB's dbgen text pools also diverge from the official binary's)
_SUITES = {
    "tpcds": ("tpcds_sf1_p1", "/tmp/dsdgen_sf1.db", "tpcds",
              "CALL dsdgen(sf=1)"),
    "tpch": ("tpch_sf0.1_p1", "/tmp/dbgen_sf01.db", "tpch",
             "CALL dbgen(sf=0.1)"),
}
_KIND = "tpch" if "--suite" in sys.argv and "tpch" in sys.argv else (
    "tpch" if "--tpch" in sys.argv else "tpcds")
_SNAME, DUCK_DB, _EXT, _GEN = _SUITES[_KIND]
SUITE = f"/root/reference/regression-test/suites/{_SNAME}"
DB = f"regression_test_{_SNAME.replace('.', '_')}"

# TPC_SF=0.01 swaps in a smaller dataset (same suite DDL + query text,
# own warehouse DB + duck file) — the affordable pytest-gate scale
_SF_ENV = os.environ.get("TPC_SF")
if _SF_ENV:
    _tag = _SF_ENV.replace(".", "_")
    DUCK_DB = f"/tmp/{_EXT}_gen_sf{_tag}.db"
    _GEN = re.sub(r"sf=[\d.]+", f"sf={_SF_ENV}", _GEN)
    DB = f"{DB}_sf{_tag}"


# words that legitimately precede a string literal (so the literal is
# an operand, not an alias)
_LIT_KEEP = {
    "THEN", "ELSE", "WHEN", "AND", "OR", "NOT", "IN", "LIKE", "ESCAPE",
    "BETWEEN", "IS", "DATE", "TIMESTAMP", "INTERVAL", "AS", "SELECT",
    "WHERE", "HAVING", "ON", "BY", "ALL", "ANY", "SOME", "CASE",
    "DAY", "MONTH", "YEAR", "CAST", "COALESCE", "NULLIF", "IF",
}


def duckify(sql: str) -> str:
    """Official-TPC-DS dialect -> DuckDB-parsable ANSI, semantics
    preserved (applied ONLY to the DuckDB copy; the engine runs the
    suite's original text):
    - `expr 'alias'` single-quoted aliases -> `expr AS "alias"`
      (DuckDB rejects string literals as aliases);
    - reserved words `year` / `returns` used as bare aliases or column
      references -> double-quoted identifiers."""
    out, pos = [], 0
    for m in re.finditer(r"([\w)])[ \t]+'([^'\n]*)'", sql):
        pw = re.search(r"(\w+)\s*$", sql[: m.start(2) - 1])
        if pw and pw.group(1).upper() in _LIT_KEEP:
            continue
        out.append(sql[pos : m.end(1)])
        out.append(' AS "' + m.group(2).replace('"', '""') + '"')
        pos = m.end(2) + 1
    out.append(sql[pos:])
    sql = "".join(out)
    sql = re.sub(r"(?i)(?<![\w.'])returns(?![\w('])", '"returns"', sql)

    def _quote_year(m):
        before, after = sql_y[: m.start()], sql_y[m.end():]
        if re.search(r"'\s*$", before):        # interval '1' year
            return m.group(0)
        if re.match(r"\s+from\b", after, re.I):  # extract(year from ...)
            return m.group(0)
        return '"year"'

    sql_y = sql
    sql = re.sub(r"(?i)(?<![\w.'\"])year(?![\w('\"])", _quote_year, sql_y)
    # Doris stddev_samp/var_samp of a single value is 0.0, not NULL
    # (pinned by the reference's agg_sync_mv goldens; the engine macro
    # reproduces it) — align the duck copy
    sql = re.sub(
        r"(?i)\b(stddev_samp|var_samp)\s*\(([^()]*)\)",
        r"(CASE WHEN count(\2) = 1 THEN 0.0 ELSE \1(\2) END)",
        sql,
    )
    # date('1994-01-01') function form (tpch q20) -> DATE literal
    sql = re.sub(r"(?i)\bdate\s*\(\s*('[^']*')\s*\)", r"DATE \1", sql)
    # Doris (and the engine) TRUNCATES decimal->int casts; DuckDB rounds
    # half away from zero. Align the duck copy where the operand is a
    # division (the only way the suite produces fractional cast inputs,
    # q54's revenue/50 segments).
    sql = re.sub(
        r"(?i)CAST\s*\(\s*\(([^()]*/[^()]*)\)\s+AS\s+"
        r"(TINYINT|SMALLINT|INT|INTEGER|BIGINT)\b",
        r"CAST(TRUNC((\1)) AS \2",
        sql,
    )
    return sql


def canon(v):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, decimal.Decimal)):
        return float(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()[:19]
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(rows):
    return sorted(
        (tuple(canon(v) for v in r) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def _veq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if f"{a:.7g}" == f"{b:.7g}":
            return True
        # Doris truncates avg(DECIMAL) at scale max(s,4) where ANSI
        # engines round — forgive <= 1 ulp at scale 4
        return abs(a - b) <= 1.05e-4
    return a == b


def rows_equal(got, want) -> bool:
    return len(got) == len(want) and all(
        len(g) == len(w) and all(_veq(x, y) for x, y in zip(g, w))
        for g, w in zip(got, want)
    )


def strip_sets(sql: str) -> str:
    sql = re.sub(r"(?mi)^\s*SET\s+[\w@.]+\s*=\s*[^;]*;\s*", "", sql)
    sql = sql.strip().rstrip(";").strip()
    # drop the trailing OUTER LIMIT on BOTH engines: ORDER-BY ties at the
    # cutoff let two correct engines keep different rows; the unlimited
    # sorted row-set compare is deterministic AND strictly stronger
    return re.sub(r"(?i)\bLIMIT\s+\d+\s*$", "", sql).strip()


def main() -> None:
    import time as _time

    os.environ["TZ"] = "Asia/Shanghai"
    _time.tzset()

    import duckdb

    import ref_suite_runner as rs
    from doris_spark.engine import Engine

    eng = Engine()
    eng.spark.sparkContext.setLogLevel("ERROR")
    eng.spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    eng.spark.conf.set("spark.sql.ansi.enabled", "false")
    # stream-load writes CSV strings into typed columns (LEGACY casts,
    # exactly like ref_suite_runner.main)
    eng.spark.conf.set("spark.sql.storeAssignmentPolicy", "LEGACY")

    def use_db():
        eng.spark.sql(f"CREATE DATABASE IF NOT EXISTS {DB}")
        eng.spark.sql(f"USE {DB}")

    if os.environ.get("TPCDS_SKIP_LOAD"):
        # iterate on queries against the already-loaded warehouse dirs
        # (the in-memory catalog forgets tables across sessions; the
        # parquet written by a prior full run persists)
        use_db()
        wh = eng.spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).replace("file:", "")
        dbdir = os.path.join(wh, f"{DB.lower()}.db")
        for d in sorted(glob.glob(os.path.join(dbdir, "*"))):
            t = os.path.basename(d)
            eng.spark.sql(
                f"CREATE TABLE IF NOT EXISTS `{t}` USING parquet "
                f"LOCATION '{d}'"
            )
    else:
        assert rs._ensure_tpc_suite_fixture(
            eng, os.path.join(SUITE, "load.groovy"), use_db,
            sf_override=f"sf{_SF_ENV}" if _SF_ENV else None,
        ), "fixture loader did not engage"
        use_db()

    duck = duckdb.connect(DUCK_DB)
    duck.execute(f"LOAD {_EXT}")
    if not duck.execute("SHOW TABLES").fetchall():
        duck.execute(_GEN)
    # suite-level views (tpch revenue1): replay the suite's own view DDL
    # on the duck side too (ANSI bodies; Doris IF NOT EXISTS is valid)
    for p in sorted(glob.glob(os.path.join(SUITE, "ddl", "*.sql"))):
        text = open(p).read()
        if re.search(r"\bcreate\s+view\b", text, re.I):
            try:
                duck.execute(text.strip().rstrip(";"))
            except Exception:
                pass

    only = {a for a in sys.argv[1:]
            if not a.startswith("--") and a not in ("tpch", "tpcds")}
    passed, failures, skipped = 0, [], []
    files = sorted(glob.glob(os.path.join(SUITE, "sql", "q*.sql")))
    total = 0
    for p in files:
        stem = os.path.splitext(os.path.basename(p))[0]
        if only and stem not in only:
            continue
        text = open(p).read()
        bare = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
        bare = re.sub(r"(?m)^\s*--.*$", "", bare)
        if not bare.strip():
            skipped.append([stem, "disabled (fully commented)"])
            continue
        q = strip_sets(text)
        total += 1
        try:
            want = canon_rows(duck.execute(duckify(q)).fetchall())
        except Exception as exc:
            failures.append([stem, f"duck: {type(exc).__name__}: {str(exc)[:140]}"])
            continue
        try:
            got = canon_rows(eng.sql(q).collect())
        except Exception as exc:
            failures.append([stem, f"spark: {type(exc).__name__}: {str(exc)[:140]}"])
            continue
        if rows_equal(got, want):
            passed += 1
        else:
            why = f"rowcount {len(got)} != {len(want)}"
            if len(got) == len(want):
                for i, (g, w) in enumerate(zip(got, want)):
                    if len(g) != len(w) or not all(
                        _veq(x, y) for x, y in zip(g, w)
                    ):
                        why = f"row {i}: {str(g)[:90]} != {str(w)[:90]}"
                        break
            failures.append([stem, why])
    for stem, why in failures:
        print(f"  FAIL {stem}: {why[:160]}")
    print(f"tpcds-duck-parity: {passed}/{total} queries"
          + (f", {len(skipped)} disabled" if skipped else ""))
    json.dump(
        {"passed": passed, "total": total, "failures": failures,
         "skipped": skipped},
        open(os.environ.get("RS_OUT", "/tmp/tpcds_duck_parity.json"), "w"),
        indent=1,
    )


if __name__ == "__main__":
    main()
