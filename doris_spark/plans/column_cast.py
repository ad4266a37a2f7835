"""Doris column-path cast semantics — DECIMAL256, exact float->decimal,
packed-digit datetime->numeric, overflow->NULL integer casts.

Spark's cast differs from the reference BE's cast table
(be/src/core/data_type casts; FE rules fe/fe-core/.../nereids/util/
TypeCoercionUtils.java) in four column-path classes:

1. DECIMAL256: Doris DECIMALV3 reaches precision 76; Spark stops at 38.
   Tables declared decimalv3(p>38, s) store a NARROWED decimal column
   plus a shadow `__x256_<col>` STRING column holding the exact digits
   (populated on INSERT/stream-load). Casts FROM such a column read the
   shadow through an arbitrary-precision Arrow kernel; casts TO a >38
   precision produce the exact rendered digits the same way.
2. float/double -> decimal: Doris expands the EXACT binary value
   (9.999999999999999e36 -> 9999999999999999538762658202121142272);
   Spark parses the shortest decimal rendering. Kernel uses
   Decimal(float) — the exact IEEE expansion.
3. datetime/date -> numeric: Doris produces MySQL packed digits
   (2025-01-01 23:01:59 -> 20250101230159; dates -> YYYYMMDD), not a
   unix epoch. Pure SQL expression — stays in codegen.
4. float/double/decimal -> integer: Doris truncates toward zero and
   returns NULL on overflow (non-strict); Spark saturates doubles and
   wraps decimals. Kernel applies int bounds exactly.

The kernel is ONE pandas UDF returning STRING (the exact Doris
rendering — the value layer for >38-digit results Spark cannot type);
conversion semantics are shared with the constant folder
(plans/const_cast_fold.py), which the function_p0 *_const suites pin.
"""

from __future__ import annotations

import re
from decimal import Decimal

from doris_spark.plans import const_cast_fold as cf

_REGISTERED = set()


def register(spark) -> None:
    """Register the __doris_cast kernel (idempotent per session)."""
    key = id(spark)
    if key in _REGISTERED:
        return
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _kernel(v, conf):
        c = conf.iloc[0] if len(conf) else "str|string|0"
        kind, dst, strict_s = c.split("|")
        strict = strict_s == "1"
        out = [cast_value(x, kind, dst, strict) for x in v]
        return pd.Series(out, dtype=object)

    # real type objects (module-wide `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot infer)
    _kernel.__annotations__ = {
        "v": pd.Series, "conf": pd.Series, "return": pd.Series}
    spark.udf.register("__doris_cast", pandas_udf(_kernel, "string"))

    def _fold(vals, op):
        """Exact >38-digit fold over a collected shadow-digit array."""
        nums = [Decimal(x) for x in (vals or []) if x is not None]
        if not nums:
            return None
        if op == "sum":
            return cf._render(("dec", sum(nums), None, None))
        # avg at source scale + 4 (Doris avg decimal widening), trimmed
        s = sum(nums) / len(nums)
        return cf._render(("dec", s.normalize(), None, None))

    spark.udf.register("__dec256_fold", _fold, "string")

    def _int128_fold(vals, op):
        """Exact group_bit_{and,or,xor} over LARGEINT: int128
        two's-complement bitwise fold over collected exact-digit
        strings (be/src AggregateFunctionBitwise over Int128 — the
        DOUBLE column backing loses bits past 2^53)."""
        nums = []
        for x in vals or []:
            if x is None:
                continue
            try:
                nums.append(int(Decimal(x)))
            except Exception:
                return None
        if not nums:
            return None
        mask = (1 << 128) - 1
        acc = nums[0] & mask
        for v in nums[1:]:
            v &= mask
            if op == "and":
                acc &= v
            elif op == "or":
                acc |= v
            else:
                acc ^= v
        if acc >= 1 << 127:
            acc -= 1 << 128
        return str(acc)

    spark.udf.register("__int128_fold", _int128_fold, "string")
    _REGISTERED.add(key)


def cast_value(x, kind: str, dst: str, strict: bool) -> str | None:
    """Cast one python value with Doris BE semantics; returns the exact
    Doris rendering (or None for NULL / strict-mode error rows — strict
    overflow rows are exception-tested, never golden-compared)."""
    try:
        if kind == "json":
            return _json_cast(x, dst, strict)
        v = _wrap(x, kind, dst)
        if v is cf._NULL:
            return None
        # decimal targets ride the opaque d<p>.<s> encoding (a literal
        # 'decimal(76,38)' in the conf string would be rewritten by the
        # dialect layer's precision-narrowing tier)
        dm = re.match(r"d(\d+)\.(\d+)$", dst) or re.match(
            r"decimal(?:v3)?\((\d+)(?:,(\d+))?\)$", dst)
        if dm is not None:
            r = cf._to_decimal(v, int(dm.group(1)), int(dm.group(2) or 0),
                               strict)
        elif dst in ("string", "text") or dst.startswith(("varchar", "char")):
            import math as _m

            if v[0] in ("double", "float") and (
                _m.isnan(v[1]) or _m.isinf(v[1])
            ):
                r = ("str", "NaN" if _m.isnan(v[1])
                     else ("Infinity" if v[1] > 0 else "-Infinity"))
            else:
                r = ("str", cf._render(v))
        elif dst == "double":
            r = cf._to_float(v, strict, double=True)
        elif dst == "float":
            r = cf._to_float(v, strict, double=False)
        else:
            base = re.sub(r"\(.*", "", dst)
            if base not in cf._INT_BOUNDS:
                return None
            r = cf._to_int(v, cf._INT_BOUNDS[base], strict)
        if r is cf._NULL:
            return None
        return cf._render(r)
    except cf._NoFold:
        return None  # strict-mode error row (exception-tested in suites)
    except Exception:
        return None


def _json_cast(x, dst: str, strict: bool) -> str | None:
    """Doris JSONB -> T cast table (be/src jsonb casts): json null ->
    NULL for every target; bools coerce to 1/0 numerics; numbers to
    boolean by non-zero; arrays/objects only to STRING (raw text),
    ARRAY (element-wise bug-compat render) and STRUCT (Doris struct
    render: ', ' separators, compact ':')."""
    import json as _j

    if x is None:
        return None
    try:
        val = _j.loads(x)
    except (ValueError, TypeError):
        return None
    if val is None:
        return None
    if dst == "string":
        return x
    if dst.startswith("ja_"):
        if not isinstance(val, list):
            return None
        et = dst[3:]

        def el(e):
            if et == "boolean":
                if isinstance(e, bool):
                    return "1" if e else "0"
                if isinstance(e, (int, float)):
                    return "1" if e != 0 else "0"
                if isinstance(e, str):
                    return e  # bug-compat: string elements pass through
                return "null"
            if et in ("string", "varchar", "char", "text"):
                return _j.dumps(e) if isinstance(e, str) else str(e)
            if isinstance(e, bool):
                return "1" if e else "0"
            if isinstance(e, (int, float)):
                return str(e)
            if isinstance(e, str):
                # jsonb numeric-string elements coerce to the number
                try:
                    return str(int(e))
                except ValueError:
                    try:
                        return str(float(e))
                    except ValueError:
                        return "null"
            return "null"

        return "[" + ", ".join(el(e) for e in val) + "]"
    if dst == "jobj":
        if not isinstance(val, dict):
            return None
        return _j.dumps(val, separators=(", ", ":"))
    if isinstance(val, (list, dict)):
        return None
    if dst == "boolean":
        if isinstance(val, bool):
            return "true" if val else "false"
        if isinstance(val, (int, float)):
            return "true" if val != 0 else "false"
        return None
    # numeric targets ride the shared value kernel
    if isinstance(val, bool):
        return cast_value(1 if val else 0, "int", dst, strict)
    if isinstance(val, float):
        return cast_value(val, "double", dst, strict)
    if isinstance(val, int):
        return cast_value(Decimal(val), "dec", dst, strict)
    return cast_value(val, "str", dst, strict)


def _wrap(x, kind: str, dst: str):
    if x is None:
        return cf._NULL
    if kind in ("dec256", "dec"):
        return ("dec", x if isinstance(x, Decimal) else Decimal(str(x)),
                None, None)
    if kind == "str":
        return ("str", str(x))
    if kind in ("double", "float"):
        f = float(x)
        # decimal/integer targets read the EXACT binary value (BE
        # static_cast semantics); float targets pass through
        if (dst.startswith("decimal") or re.match(r"d\d+\.\d+$", dst)
                or re.sub(r"\(.*", "", dst) in cf._INT_BOUNDS):
            import math

            if math.isnan(f) or math.isinf(f):
                return (kind, f)
            return ("dec", Decimal(f), None, None)
        return (kind, f)
    if kind == "int":
        return ("int", int(x))
    return ("str", str(x))


# ---------------------------------------------------------------------------
# SQL rewrite: cast(<col> as <type>) -> kernel call / packed-digit expr

_CAST_COL = re.compile(
    r"\bcast\s*\(\s*`?([A-Za-z_]\w*)`?\s+as\s+"
    r"([A-Za-z_]\w*(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*\)",
    re.I,
)
_FROM_ONE = re.compile(
    r"\bfrom\s+`?([A-Za-z_]\w*)`?\s*(?:where|group|order|limit|;|$)", re.I)

_DT_T = re.compile(r"datetime|timestamp", re.I)
_D_T = re.compile(r"date(v\d)?$", re.I)
_NUM_DST = {"tinyint", "smallint", "int", "integer", "bigint", "largeint",
            "float", "double"}
_INT_DST = {"tinyint", "smallint", "int", "integer", "bigint", "largeint"}


def _src_kind(doris_t: str) -> str | None:
    t = re.sub(r"\s+", "", doris_t.lower())
    m = re.match(r"decimalv?[23]?\((\d+)(?:,(\d+))?\)", t)
    if m:
        return "dec256" if int(m.group(1)) > 38 else "dec"
    if t == "double":
        return "double"
    if t == "float":
        return "float"
    if t == "largeint":
        return "dec256"  # int128: DOUBLE backing + exact-digit shadow
    if re.match(r"(tiny|small|big)?int", t) or t == "integer":
        return "int"
    if t.startswith(("varchar", "char", "string", "text")):
        return "str"
    return None


def _packed_digits(col: str, is_date: bool, dst: str) -> str:
    """MySQL packed-digit numeric form of a date/datetime column."""
    if is_date:
        packed = (f"(year(`{col}`)*10000 + month(`{col}`)*100 + "
                  f"day(`{col}`))")
    else:
        packed = (
            f"(year(`{col}`)*CAST(10000000000 AS BIGINT) + "
            f"month(`{col}`)*100000000 + day(`{col}`)*1000000 + "
            f"hour(`{col}`)*10000 + minute(`{col}`)*100 + second(`{col}`))"
        )
    base = re.sub(r"\(.*", "", dst)
    if base == "largeint":
        return f"CAST({packed} AS DECIMAL(38,0))"
    if base in ("float", "double"):
        return f"CAST({packed} AS {base.upper()})"
    lim = {"tinyint": 7, "smallint": 15, "int": 31, "integer": 31,
           "bigint": 63}[base]
    lo, hi = -(1 << lim), (1 << lim) - 1
    return (f"(CASE WHEN {packed} BETWEEN {lo} AND {hi} "
            f"THEN CAST({packed} AS {base.upper()}) END)")


def _scan_balanced(s: str, i: int) -> int:
    """i points at '('; return index just past the matching ')'.
    Delegates to the shared tokenizer (plans/sqltok.py)."""
    from doris_spark.plans.sqltok import find_close

    return min(find_close(s, i) + 1, len(s))


_JC_HEAD = re.compile(r"\bcast\s*\(\s*", re.I)
_JC_TYPE = re.compile(
    r"\s+as\s+([A-Za-z_]+(?:\s*<[^<>]*(?:<[^<>]*>[^<>]*)*>)?"
    r"(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*\)",
    re.I,
)


def rewrite_json_casts(sql: str, strict: bool) -> str:
    """CAST(to_json(x) AS T) / CAST(cast('...' AS JSON) AS T) -> the
    JSONB cast kernel. to_json over a scalar rides the named_struct
    shim (Spark's to_json needs a container); the kernel receives the
    raw JSON text."""
    out, i = [], 0
    while True:
        m = _JC_HEAD.search(sql, i)
        if m is None:
            out.append(sql[i:])
            break
        j = m.end()
        tm = re.match(r"to_json\s*\(", sql[j:], re.I)
        cm = re.match(
            r"cast\s*\(\s*('(?:[^'\\]|\\.)*')\s+as\s+jsonb?\s*\)",
            sql[j:], re.I)
        if tm:
            k = _scan_balanced(sql, j + tm.end() - 1)
            arg = sql[j + tm.end(): k - 1]
            tj = f"to_json(named_struct('j', {arg}))"
            shim = f"substr({tj}, 6, length({tj}) - 6)"
            rest = k
        elif cm:
            shim = cm.group(1)
            rest = j + cm.end()
        else:
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        am = _JC_TYPE.match(sql, rest)
        if am is None:
            out.append(sql[i:m.end()])
            i = m.end()
            continue
        t = re.sub(r"\s+", "", am.group(1).lower())
        if t.startswith("array"):
            em = re.match(r"array<(\w+)", t)
            code = f"ja_{em.group(1) if em else 'string'}"
        elif t.startswith("struct"):
            code = "jobj"
        elif t.startswith("decimal"):
            dm = re.match(r"decimalv?3?\((\d+)(?:,(\d+))?\)", t)
            code = f"d{dm.group(1)}.{dm.group(2) or 0}" if dm else "d38.9"
        elif t in ("json", "jsonb"):
            code = "string"
        else:
            code = t
        out.append(sql[i:m.start()])
        out.append(
            f"__doris_cast({shim}, 'json|{code}|{1 if strict else 0}')")
        i = am.end()
    return "".join(out)


def rewrite_column_casts(sql: str, col_types, strict: bool) -> str:
    """Rewrite cast(<col> as <type>) per the Doris BE cast table when the
    combination needs it (see module doc). `col_types` maps lowercase
    column name -> declared Doris type for the statement's FROM table;
    statements whose FROM shape is not a single table pass through.
    Only SELECT-list casts are rewritten (the kernel returns the exact
    Doris RENDERING as a string — wrong collation for WHERE/ORDER BY)."""
    if not col_types:
        return sql
    fm = re.search(r"\bfrom\b", sql, re.I)
    head_end = fm.start() if fm else len(sql)

    def _sub(m: re.Match) -> str:
        col = m.group(1)
        dst = re.sub(r"\s+", "", m.group(2).lower())
        src_t = col_types.get(col.lower())
        if src_t is None:
            return m.group(0)
        st = re.sub(r"\s+", "", src_t.lower())
        base = re.sub(r"\(.*", "", dst)
        # datetime/date -> numeric: packed digits, pure SQL
        if _DT_T.match(st) or _D_T.match(st):
            if base in _NUM_DST:
                return _packed_digits(col, bool(_D_T.match(st)),
                                      dst)
            return m.group(0)
        kind = _src_kind(st)
        if kind is None:
            return m.group(0)
        dm = re.match(r"decimalv?3?\((\d+)(?:,(\d+))?\)", dst)
        dst_norm = (f"d{dm.group(1)}.{dm.group(2) or 0}"
                    if dm else base)
        needs = (
            kind == "dec256"                            # shadow source
            or (dm and int(dm.group(1)) > 38)           # >38 target
            or (kind in ("double", "float") and dm)     # exact binary
            or (kind in ("double", "float", "dec")
                and base in _INT_DST)                   # overflow->NULL
            # str -> decimal: >38-significant-digit strings NULL in
            # Spark; str -> float/double: '-nan'/'inf' spellings;
            # str -> int: fractional strings truncate, junk -> NULL
            or (kind == "str"
                and (dm or base in ("float", "double")
                     or base in _INT_DST))
        )
        if not needs:
            return m.group(0)
        src_ref = f"`__x256_{col}`" if kind == "dec256" else f"`{col}`"
        conf = f"{kind}|{dst_norm}|{1 if strict else 0}"
        return f"__doris_cast({src_ref}, '{conf}')"

    head = _CAST_COL.sub(_sub, sql[:head_end])

    def _agg_sub(m: re.Match) -> str:
        fn, col = m.group(1).lower(), m.group(2)
        st = col_types.get(col.lower())
        if st is None or _src_kind(re.sub(r"\s+", "", st.lower())) != \
                "dec256":
            return m.group(0)
        sh = f"`__x256_{col.lower()}`"
        if fn in ("min", "max"):
            # numeric order via the DOUBLE magnitude, exact digits out
            return (f"{fn}(named_struct('m', CAST({sh} AS DOUBLE), "
                    f"'v', {sh})).v")
        if fn == "any_value":
            return f"any_value({sh})"
        if fn in ("approx_count_distinct", "ndv"):
            return f"approx_count_distinct({sh})"
        return f"__dec256_fold(collect_list({sh}), '{fn}')"

    head = re.sub(
        r"\b(any_value|min|max|avg|sum|approx_count_distinct|ndv)"
        r"\s*\(\s*`?(\w+)`?\s*\)",
        _agg_sub, head, flags=re.I)
    tail = sql[head_end:]
    if "__doris_cast" in head and _order_by_hits_rewrite(head, tail):
        # a rewritten cast is STRING-typed: if ORDER BY references its
        # alias (or its select-list ordinal) the sort would become
        # lexicographic ('9' > '10') — keep the original statement
        # (round-8 ADVICE)
        return sql
    return head + tail


def _split_top_commas(s: str) -> list[str]:
    """Shared-tokenizer top-level comma split (plans/sqltok.py)."""
    from doris_spark.plans.sqltok import split_args_top

    return split_args_top(s)


def _order_by_hits_rewrite(head: str, tail: str) -> bool:
    """True when the statement's ORDER BY references (by alias or by
    select-list ordinal) a select item whose cast was rewritten to the
    STRING-returning __doris_cast kernel."""
    ob = re.search(r"(?i)\border\s+by\b(.*)$", tail, re.S)
    if ob is None:
        return False
    sel = re.sub(r"(?is)^\s*select\s+(distinct\s+)?", "", head)
    names, positions = set(), set()
    for i, item in enumerate(_split_top_commas(sel), 1):
        if "__doris_cast" not in item:
            continue
        positions.add(i)
        am = re.search(r"(?i)\bas\s+`?(\w+)`?\s*$", item.strip())
        if am is None:
            am = re.search(r"(?<![\w.`])`?([A-Za-z_]\w*)`?\s*$",
                           item.strip())
            if am is not None and am.group(1).lower() in (
                    "end", "null", "true", "false"):
                am = None
        if am is not None:
            names.add(am.group(1).lower())
    for term in _split_top_commas(ob.group(1)):
        t = re.sub(r"(?i)\s+(asc|desc)(\s+nulls\s+(first|last))?\s*$",
                   "", term.strip()).strip()
        if t.isdigit() and int(t) in positions:
            return True
        if t.strip("`").lower() in names:
            return True
    return False
