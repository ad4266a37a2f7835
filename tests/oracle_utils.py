"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
fixtures, canonicalizes values (columns sorted by name, rows sorted,
doubles rounded to 12 significant digits — FIXTURES.md harness
conventions), and diffs.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _round_sig(x: float, sig: int = 12):
    if x == 0 or not math.isfinite(x):
        return x
    return round(x, sig - 1 - int(math.floor(math.log10(abs(x)))))


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return _round_sig(v)
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


def canon_rows(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return sorted(c for c in col_names), out


def compare(spark_df, con, oracle_sql: str):
    """Return (ok, message). Mirrors driver: count + schema-names + values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sr) != len(dr):
        return False, f"row count mismatch: spark={len(sr)} duckdb={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
    return True, f"ok ({len(sr)} rows)"
