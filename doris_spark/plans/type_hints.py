"""Doris column-type hints for text-level macro expansion.

Spark's TimestampType carries no scale, but Doris DATETIMEV2(n) renders
with exactly n fractional digits ('2012-03-01 01:00:01.000000' for
n=6) — information that lives only in the Doris DDL. The DDL handlers
(tools/ref_parity.py run_setup, Engine DDL paths) register each
column's declared Doris type here, and scale-sensitive string macros
(array_join over array<datetimev2(n)> — pinned by
nereids_function_p0/scalar_function/Array.groovy) consult it by bare
column name. A name declared with CONFLICTING types across tables is
dropped (conservative: the macro falls back to Spark's rendering).
"""

from __future__ import annotations

import re

COLUMN_TYPES: dict[str, str] = {}
_CONFLICT: set[str] = set()
# statement-scoped overlay: when the harness knows the statement's FROM
# is a single table, that table's declared types take precedence and
# BYPASS the cross-table conflict set (common column names like k2 are
# declared with different types across suite tables; the global map
# alone would drop them)
SCOPED: dict[str, str] = {}


def set_scope(cols) -> None:
    """cols: iterable of (name, doris_type_string) for the statement's
    single FROM table. Replaces any previous scope."""
    SCOPED.clear()
    for name, typ in cols:
        SCOPED[str(name).strip("`").lower()] = re.sub(
            r"\s+", "", str(typ).lower())


def clear_scope() -> None:
    SCOPED.clear()


def lookup(key: str) -> str | None:
    """Scoped-first column-type lookup. Scoped names ignore _CONFLICT;
    global names in _CONFLICT return None (conservative)."""
    k = str(key).strip("`").lower()
    if k in SCOPED:
        return SCOPED[k]
    if k in _CONFLICT:
        return None
    return COLUMN_TYPES.get(k)


# columns that carry an exact-digit `__x256_<name>` STRING shadow twin
# (DECIMAL256 / LARGEINT — created by the DDL paths that narrow them);
# rewrites may reference the shadow ONLY for names registered here
SHADOWED: set[str] = set()


def register_shadowed(names) -> None:
    for n in names:
        SHADOWED.add(str(n).strip("`").lower())


def has_shadow(key: str) -> bool:
    return str(key).strip("`").lower() in SHADOWED


def register_columns(cols) -> None:
    """cols: iterable of (name, doris_type_string)."""
    for name, typ in cols:
        key = str(name).strip("`").lower()
        t = re.sub(r"\s+", "", str(typ).lower())
        old = COLUMN_TYPES.get(key)
        if old is not None and old != t:
            _CONFLICT.add(key)
        COLUMN_TYPES[key] = t


def array_datetime_scale(expr: str) -> int | None:
    """If `expr` is a bare column declared array<datetimev2(n)> /
    array<datetime(n)> with n > 0, return n."""
    key = expr.strip().strip("`").lower()
    if not re.fullmatch(r"[a-z_]\w*", key):
        return None
    t = lookup(key)
    if t is None:
        return None
    m = re.fullmatch(r"array<datetime(?:v2)?\((\d)\)>", t)
    if m and int(m.group(1)) > 0:
        return int(m.group(1))
    return None
