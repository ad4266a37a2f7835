"""MySQL/Doris SQL dialect -> Spark SQL translation.

The reference FE accepts MySQL-compatible SQL (DorisParser.g4 grammar,
MySQL function spellings, %-format strings, 1-based array subscripts,
map/array literals, composite interval units). This module is that
dialect layer for Engine.sql: a pure-text, quote-aware rewriter applied
BEFORE the macro layer (plans/sql_macros.py), so a Doris user's SQL
runs verbatim. It is deliberately not a full parser — each rule is a
targeted, quote/paren-aware transform, validated case-by-case against
the reference's own golden suites (tools/ref_parity.py).
"""

from __future__ import annotations

import re

_MYSQL_FMT = {
    "Y": "yyyy", "y": "yy", "m": "MM", "c": "M", "d": "dd", "e": "d",
    "H": "HH", "k": "H", "h": "hh", "I": "hh", "l": "h", "i": "mm",
    "s": "ss", "S": "ss", "f": "SSSSSS", "p": "a", "b": "MMM", "M": "MMMM",
    "a": "EEE", "W": "EEEE", "j": "DDD", "T": "HH:mm:ss", "r": "hh:mm:ss a",
    "%": "%",
}


# canonical scanners live in plans/sqltok.py (one tokenizer for every
# rewrite tier); these names stay for this module's many call sites and
# for typed_arith's historical `from dialect import _lit_spans`
from doris_spark.plans.sqltok import lit_spans as _lit_spans  # noqa: E402
from doris_spark.plans.sqltok import (  # noqa: E402
    sub_outside_literals as _sub_outside_literals,
)


_MAKE_IVL = {
    "day": "make_dt_interval({e})",
    "week": "make_dt_interval(7 * ({e}))",
    "hour": "make_dt_interval(0, {e})",
    "minute": "make_dt_interval(0, 0, {e})",
    "second": "make_dt_interval(0, 0, 0, {e})",
    "month": "make_ym_interval(0, {e})",
    "quarter": "make_ym_interval(0, 3 * ({e}))",
    "year": "make_ym_interval({e})",
}


def make_interval_expr(count: str, unit: str) -> str | None:
    """`INTERVAL <expr> <unit>` with a NON-LITERAL count -> a
    make_dt_interval/make_ym_interval call (Spark's INTERVAL literal
    syntax refuses expressions like kint+1)."""
    tpl = _MAKE_IVL.get(unit.lower())
    return tpl.format(e=count) if tpl else None


# _sub_outside_literals: imported from sqltok above.


def _xlate_fmt(fmt: str) -> str:
    """MySQL %-pattern -> Java datetime pattern; literal text quoted."""
    out, lit = [], []

    def flush():
        if lit:
            text = "".join(lit)
            out.append("'" + text.replace("'", "''") + "'" if re.search(r"[A-Za-z']", text) else text)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = _MYSQL_FMT.get(fmt[i + 1])
            if tok is not None:
                flush()
                out.append(tok)
                i += 2
                continue
        lit.append(fmt[i])
        i += 1
    flush()
    return "".join(out)


_SQL_KEYWORDS_BEFORE_LITERAL = {
    "select", "where", "and", "or", "not", "when", "then", "else", "in",
    "by", "as", "union", "all", "values", "distinct", "having", "on",
    "return", "returns", "if", "between", "like", "is", "set",
}


def _bracket_arrays(s: str) -> str:
    """Doris array literal [a, b] -> array(a, b); subscripts (x[1]) kept.
    A '[' directly after an identifier/closing bracket is a subscript; a
    whitespace-separated '[' after a KEYWORD (select [1,2]) is a literal."""
    out, stack = [], []
    prev = ""
    word: list[str] = []
    last_word = ""
    gap = False  # whitespace between prev token and current char
    in_str = None
    for ch in s:
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in ("'", '"'):
            in_str = ch
            out.append(ch)
            prev = ch
            word.clear()
            gap = False
            continue
        if ch == "[":
            if prev.isalnum() or prev in ")]_'\"":
                is_literal = gap and last_word.lower() in _SQL_KEYWORDS_BEFORE_LITERAL
            else:
                is_literal = True
            stack.append(is_literal)
            out.append("array(" if is_literal else "[")
        elif ch == "]" and stack:
            out.append(")" if stack.pop() else "]")
        else:
            out.append(ch)
        if ch.isalnum() or ch == "_":
            word.append(ch)
            gap = False
        elif ch.isspace():
            if word:
                last_word = "".join(word)
                word.clear()
            gap = True
        else:
            word.clear()
            last_word = ""
            gap = False
        if not ch.isspace():
            prev = ch
    return "".join(out)


_DATE_UNITS_MICROS = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


# MySQL composite interval units -> ANSI range intervals (the literal
# formats coincide: '1 2:3:4' DAY_SECOND == ANSI DAY TO SECOND).
_COMPOSITE_UNITS = {
    "DAY_HOUR": "DAY TO HOUR",
    "DAY_MINUTE": "DAY TO MINUTE",
    "DAY_SECOND": "DAY TO SECOND",
    "DAY_MICROSECOND": "DAY TO SECOND",
    "HOUR_MINUTE": "HOUR TO MINUTE",
    "HOUR_SECOND": "HOUR TO SECOND",
    "HOUR_MICROSECOND": "HOUR TO SECOND",
    "MINUTE_SECOND": "MINUTE TO SECOND",
    "MINUTE_MICROSECOND": "MINUTE TO SECOND",
    "SECOND_MICROSECOND": "SECOND",
    "YEAR_MONTH": "YEAR TO MONTH",
}


_TZ_CANON: dict | None = None


def _tz_canon(name: str) -> str:
    """Case-insensitive canonical IANA zone name (Doris FE behavior)."""
    global _TZ_CANON
    if _TZ_CANON is None:
        try:
            import zoneinfo

            _TZ_CANON = {z.lower(): z for z in zoneinfo.available_timezones()}
        except Exception:
            _TZ_CANON = {}
    return _TZ_CANON.get(name.lower(), name)


def _dt_round_expr(src: str, prec: int) -> str:
    """Timestamp expression ROUNDED (half-up on the fraction) to `prec`
    fractional digits, in exact BIGINT micros — a double round-trip loses
    ~8us at year-1 instants (|unix_micros| ~ 6e16 > 2^53)."""
    if prec >= 6:
        return f"CAST(({src}) AS TIMESTAMP)"
    unit = 10 ** (6 - prec)
    y = f"(unix_micros(CAST(({src}) AS TIMESTAMP)) + {unit // 2})"
    # floor division (Spark's `div` truncates toward zero)
    q = (
        f"({y} div {unit} + (CASE WHEN {y} < 0 AND {y} % {unit} != 0 "
        f"THEN -1 ELSE 0 END))"
    )
    return f"timestamp_micros({q} * {unit})"


def _cast_time_dt0(text: str) -> str:
    """CAST(x AS TIME[(n)]) -> __doris_time(x)  (TIME shim: canonical
    'H:MM:SS' string, Doris TimeV2 domain); bare CAST(x AS DATETIME) ->
    second-ROUNDED timestamp (MySQL/Doris DATETIME(0) rounds, not
    truncates). Runs before the plain AS-DATETIME regexes so the
    no-precision form can wrap its source expression."""
    out, i, n = [], 0, len(text)
    pat = re.compile(r"CAST\s*\(", re.I)
    while i < n:
        m = pat.search(text, i)
        if m is None:
            out.append(text[i:])
            break
        j, depth, in_str = m.end() - 1, 0, None
        while j < n:
            c = text[j]
            if in_str:
                if c == in_str:
                    in_str = None
            elif c in ("'", '"'):
                in_str = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = text[m.end() : j]
        tm = re.search(r"\s+AS\s+TIME(?:V2)?\s*(?:\(\s*\d+\s*\))?\s*$", body, re.I)
        dm = re.search(
            r"\s+AS\s+(?:DATETIME(?:V[12])?|TIMESTAMPTZ)\s*"
            r"(?:\(\s*(\d+)\s*\))?\s*$",
            body, re.I,
        )
        out.append(text[i : m.start()])
        if tm:
            # typed cast: typeof() dispatches numeric ±HHMMSS packing /
            # datetime time-part extraction / strict string parse
            src = _cast_time_dt0(body[: tm.start()].strip())
            out.append(
                f"__doris_time_cast(CAST(({src}) AS STRING), typeof({src}))"
            )
        elif dm:
            # DATETIME(n)/DATETIMEV2(n) ROUNDS to n fractional digits
            # (MySQL/Doris semantics; bare DATETIME is precision 0)
            prec = int(dm.group(1) or 0)
            unit = 10 ** (6 - prec)
            src = _cast_time_dt0(body[: dm.start()].strip())
            # MySQL parses a bare 'N:N:N' literal as yy-mm-dd (!) when
            # cast to datetime: '10:10:10' -> 2010-10-10 00:00:00
            lm = re.match(r"^(['\"])(\d{1,2}):(\d{1,2}):(\d{1,2})\1$", src)
            if lm:
                yy, mo, dd = (int(lm.group(i)) for i in (2, 3, 4))
                year = 2000 + yy if yy < 70 else 1900 + yy
                src = (
                    f"'{year:04d}-{mo:02d}-{dd:02d} 00:00:00'"
                    if 1 <= mo <= 12 and 1 <= dd <= 31
                    else "NULL"
                )
            out.append(_dt_round_expr(src, prec))
        else:
            out.append("CAST(" + _cast_time_dt0(body) + ")")
        i = j + 1
    return "".join(out)


def _timediff_scale(sql: str) -> str:
    """Doris timediff returns a TIME scaled to max(operand precisions).
    When the operands carry explicit DATETIME[V2](n) / DATE casts, the
    scale is statically known — append it as a third argument (the macro
    layer renders fixed-scale); bare DATE/DATETIME contribute scale 0."""
    pat = re.compile(r"\btimediff\s*\(", re.I)
    pos = 0
    while True:
        m = pat.search(sql, pos)
        if m is None:
            return sql
        depth, k, in_str, n = 1, m.end(), None, len(sql)
        top_commas = 0
        while k < n and depth:
            c = sql[k]
            if in_str:
                if c == in_str:
                    in_str = None
            elif c in ("'", '"'):
                in_str = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_commas += 1
            k += 1
        args = sql[m.end() : k - 1]
        scales = [
            int(g) for g in re.findall(
                r"\bAS\s+DATETIMEV?2?\s*\(\s*(\d)\s*\)", args, re.I
            )
        ]
        typed = bool(
            re.search(r"\bAS\s+(DATE(TIMEV?2?)?)\b", args, re.I)
        )
        if top_commas == 1 and typed:
            scale = max(scales) if scales else 0
            sql = sql[: k - 1] + f", {scale}" + sql[k - 1 :]
            pos = k + 4
        else:
            pos = k
    return sql


_DOTTED_DATELIT = re.compile(
    r"CAST\(\s*'(\d{2,4})[./](\d{1,2})[./](\d{1,2})([ T][\d:.]+)?'\s+AS\s+"
    r"(DATE|TIMESTAMP|DATETIME)",
    re.I,
)


def _norm_dotted_datelit(m: re.Match) -> str:
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if y < 100:
        y = 2000 + y if y < 70 else 1900 + y
    return f"CAST('{y:04d}-{mo:02d}-{d:02d}{m.group(4) or ''}' AS {m.group(5)}"


_GB_TAIL = re.compile(
    r"\s+(WITH\s+ROLLUP\b|HAVING\b|ORDER\s+BY\b|LIMIT\b)", re.I
)


def _group_by_dirs(s: str) -> str:
    """MySQL `GROUP BY k1 ASC, k2 DESC [WITH ROLLUP] [HAVING ...]`:
    strip the per-key direction markers and append the implied ORDER BY
    after the HAVING clause (an explicit ORDER BY wins)."""
    pat = re.compile(r"\bGROUP\s+BY\s+", re.I)
    pos = 0
    while True:
        m = pat.search(s, pos)
        if m is None:
            return s
        # scan the grouping list: top-level until a tail keyword, a
        # depth-0 ')', or end
        i, depth, in_q, n = m.end(), 0, None, len(s)
        end = n
        while i < n:
            c = s[i]
            if in_q:
                if c == in_q:
                    in_q = None
            elif c in ("'", '"'):
                in_q = c
            elif c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    end = i
                    break
                depth -= 1
            elif depth == 0:
                tm = _GB_TAIL.match(s, i)
                if tm:
                    end = i
                    break
            i += 1
        glist = s[m.end():end]
        if not re.search(r"\b(ASC|DESC)\s*(,|$)", glist.strip(), re.I):
            pos = m.end()
            continue
        items, dirs = [], []
        for item in re.split(r",(?![^()]*\))", glist):
            dm = re.match(r"^(.*?)\s+(ASC|DESC)\s*$", item.strip(), re.I | re.S)
            if dm:
                items.append(dm.group(1))
                dirs.append(f"{dm.group(1)} {dm.group(2).upper()}")
            else:
                items.append(item.strip())
                dirs.append(f"{item.strip()} ASC")
        # tail: [WITH ROLLUP] [HAVING ...] [ORDER BY ...] [LIMIT ...]
        tail = s[end:]
        explicit_order = re.match(
            r"(\s+WITH\s+ROLLUP)?(\s+HAVING\b(?:(?!\bORDER\s+BY\b|\bLIMIT\b).)*)?"
            r"\s*ORDER\s+BY\b", tail, re.I | re.S,
        )
        if explicit_order:
            new = m.group(0) + ", ".join(items) + tail
            s = s[: m.start()] + new
            pos = m.start() + len(m.group(0)) + len(", ".join(items))
            continue
        tm2 = re.match(
            r"((?:\s+WITH\s+ROLLUP)?)((?:\s+HAVING\b(?:(?!\bLIMIT\b).)*?)?)"
            r"((?:\s+LIMIT\b.*)?|\s*\).*|\s*)$",
            tail, re.I | re.S,
        )
        rollup, having, rest = tm2.group(1), tm2.group(2), tm2.group(3)
        new_tail = f"{rollup}{having} ORDER BY {', '.join(dirs)}{rest}"
        s = s[: m.start()] + m.group(0) + ", ".join(items) + new_tail
        pos = m.start() + len(m.group(0)) + len(", ".join(items))
    return s


def _dt_from_numeric_inline(x: str) -> str:
    """Inline body of the __dt_from_numeric SQL UDF (packed-digit
    yyyyMMdd / yyMMdd / *HHmmss reading) — usable where Spark bans SQL
    UDFs (Sort, Generate)."""
    v = f"CAST(({x}) AS BIGINT)"
    s = f"CAST({v} AS STRING)"
    return (
        f"(CASE WHEN {v} IS NULL THEN NULL "
        f"WHEN length({s}) = 8 THEN to_timestamp({s}, 'yyyyMMdd') "
        f"WHEN length({s}) = 14 THEN to_timestamp({s}, 'yyyyMMddHHmmss') "
        f"WHEN length({s}) = 6 THEN to_timestamp({s}, 'yyMMdd') "
        f"WHEN length({s}) = 12 THEN to_timestamp({s}, 'yyMMddHHmmss') "
        f"ELSE NULL END)"
    )


def _quote_unicode_idents(s: str) -> str:
    """Doris accepts unquoted non-ASCII identifiers (列名); Spark requires
    backticks — add them, outside string literals and existing backticks."""
    out, i, n, in_q = [], 0, len(s), None
    ident = re.compile(r"[A-Za-z_0-9\u0080-\uffff]+")
    while i < n:
        c = s[i]
        if in_q:
            out.append(c)
            if c == in_q:
                in_q = None
            i += 1
            continue
        if c in ("'", '"', "`"):
            in_q = c
            out.append(c)
            i += 1
            continue
        m = ident.match(s, i)
        if m:
            tok = m.group(0)
            if any(ord(ch) > 127 for ch in tok):
                out.append(f"`{tok}`")
            else:
                out.append(tok)
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


_RIGHT_SEMI = re.compile(r"\bright\s+(semi|anti)\s+join\b", re.I)
_FROM_KWS = {
    "from", "join", "on", "where", "select", "union", "intersect",
    "except", "and", "or", "using", "all", "distinct", "by", "lateral",
}


_NULL_SUB = re.compile(r"(?i)\[\s*NULL\s*\]")


def _rewrite_null_subscript(sql: str) -> str:
    """`base[NULL]` -> `base[concat(char(0),'null')]` ONLY where the
    base is a map_agg(..) call, a chained subscript, or a name NOT
    declared array-typed (plans.type_hints). Arrays keep their NULL
    index; other bases keep the old sentinel lookup (NULL result,
    same as Doris)."""
    spans = _lit_spans(sql)
    out, last = [], 0
    for m in _NULL_SUB.finditer(sql):
        if any(a <= m.start() < b for a, b in spans):
            continue
        i = m.start() - 1
        while i >= 0 and sql[i] in " \t\n":
            i -= 1
        rewrite = True
        if i >= 0 and sql[i] == ")":
            # call base: rewrite only for map_agg(..)
            depth, j, in_q = 0, i, None
            while j >= 0:
                c = sql[j]
                if in_q:
                    if c == in_q:
                        in_q = None
                elif c in ("'", '"'):
                    in_q = c
                elif c == ")":
                    depth += 1
                elif c == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            k = j - 1
            while k >= 0 and sql[k] in " \t\n":
                k -= 1
            e = k
            while k >= 0 and (sql[k].isalnum() or sql[k] == "_"):
                k -= 1
            rewrite = sql[k + 1 : e + 1].lower() == "map_agg"
        elif i >= 0 and (sql[i].isalnum() or sql[i] in "_`"):
            e = i
            if sql[i] == "`":
                e -= 1
            k = e
            while k >= 0 and (sql[k].isalnum() or sql[k] == "_"):
                k -= 1
            name = sql[k + 1 : e + 1]
            from doris_spark.plans import type_hints as th

            rewrite = not (th.lookup(name) or "").startswith("array")
        if rewrite:
            out.append(sql[last : m.start()])
            out.append("[concat(char(0), 'null')]")
            last = m.end()
    out.append(sql[last:])
    return "".join(out)


_CAST_HEAD = re.compile(r"(?i)\bCAST\s*\(")
_DEC_BIG = re.compile(
    r"(?i)^DECIMALV?[23]?\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*$")


def _src_integral_digits(expr: str):
    """Max integral digits the expression can produce, from declared
    type hints / inner cast targets; None when unknowable."""
    e = expr.strip()
    im = re.match(r"(?i)^CAST\s*\((.*)\s+AS\s+([\w()\s,]+)\)$", e, re.S)
    if im:
        t = re.sub(r"\s+", "", im.group(2).lower())
    else:
        cm = re.fullmatch(r"`?(?:\w+\.)?(\w+)`?", e)
        if not cm:
            return None
        from doris_spark.plans import type_hints as th

        t = th.lookup(cm.group(1))
        if t is None:
            return None
    dm = re.match(r"decimalv?[23]?\((\d+),?(\d*)\)", t)
    if dm:
        p_, s_ = int(dm.group(1)), int(dm.group(2) or 0)
        return max(0, p_ - s_)
    return {"tinyint": 3, "smallint": 5, "int": 10, "integer": 10,
            "bigint": 19, "largeint": 39, "boolean": 1}.get(
        re.sub(r"\(.*", "", t))


def _narrow_dec256_casts(sql: str) -> str:
    """CAST(expr AS DECIMAL(p>38, s)) with a typed source: narrow to
    DECIMAL(38, min(s, 38 - source_integral)) — exact whenever the
    source's integral range fits (fe enable_decimal256, pinned by
    query_p0/join/test_join_decimal256*). Unknown sources fall through
    to the integral-preserving blanket rule."""
    from doris_spark.plans.sqltok import find_close

    pos = 0
    while True:
        m = _CAST_HEAD.search(sql, pos)
        if m is None:
            return sql
        o = m.end() - 1
        c = find_close(sql, o)
        if c >= len(sql):
            return sql
        inner = sql[o + 1 : c]
        am = re.search(r"(?is)\s+AS\s+(DECIMALV?[23]?\s*\(\s*\d+\s*,"
                       r"\s*\d+\s*\))\s*$", inner)
        if am is None:
            pos = m.end()
            continue
        dm = _DEC_BIG.match(am.group(1))
        if dm is None or int(dm.group(1)) <= 38:
            pos = m.end()
            continue
        s_ = int(dm.group(2))
        integ = _src_integral_digits(inner[: am.start()])
        if integ is None:
            pos = m.end()
            continue
        s2 = max(0, min(s_, 38 - min(integ, 38)))
        sql = (sql[: o + 1 + am.start()]
               + f" AS DECIMAL(38,{s2})" + sql[c:])
        pos = m.end()


def _rewrite_right_semi_anti(sql: str) -> str:
    """Doris `A right semi|anti join B ON c` -> `B left semi|anti join A
    ON c` (Spark has no RIGHT SEMI/ANTI). Output columns come from B in
    both spellings, and the ON clause is position-preserved by swapping
    only the operand texts. Operand extraction is conservative — a
    table ref `name [alias]` or a parenthesized subquery `( ... )
    [alias]` at the start of a FROM item; anything else is left alone
    (pinned by nereids_tpch_p0 q4/q21). Each rewrite restarts the scan
    on the mutated string (fresh finditer + _lit_spans) — continuing
    with stale match objects after a chained-segment rewrite relocates
    earlier matches and would swap at stale offsets. Terminates because
    every rewrite converts a RIGHT semi/anti into LEFT."""
    for _ in range(32):
        new = _rsa_one_pass(sql)
        if new is None:
            return sql
        sql = new
    return sql


def _rsa_one_pass(sql: str):
    """One scan of `_rewrite_right_semi_anti`: perform the rightmost
    applicable swap and return the mutated SQL, or None if no RIGHT
    SEMI/ANTI join remains rewritable."""
    spans = _lit_spans(sql)

    def in_lit(i: int) -> bool:
        return any(a <= i < b for a, b in spans)

    for m in reversed(list(_RIGHT_SEMI.finditer(sql))):
        if in_lit(m.start()):
            continue
        kind = m.group(1).lower()
        # ---- chained left operand: when the text between the
        # governing FROM (or enclosing paren) and this join keyword
        # contains an ON/USING at depth 0, Doris's parse makes the
        # WHOLE preceding left-deep join tree the left operand — swap
        # the full segment, parenthesized, instead of the last table
        # ref (nereids_syntax_p0 join_condition/runtime_filter chains)
        seg_start = None
        depth_b, ib = 0, m.start() - 1
        while ib >= 0:
            if in_lit(ib):
                ib -= 1
                continue
            ch = sql[ib]
            if ch == ")":
                depth_b += 1
            elif ch == "(":
                if depth_b == 0:
                    seg_start = ib + 1
                    break
                depth_b -= 1
            elif (
                depth_b == 0
                and ch in "mM"
                and ib >= 3
                and sql[ib - 3 : ib + 1].lower() == "from"
                and (ib == 3 or not (sql[ib - 4].isalnum()
                                     or sql[ib - 4] == "_"))
                and (ib + 1 >= len(sql) or not (sql[ib + 1].isalnum()
                                                or sql[ib + 1] == "_"))
            ):
                seg_start = ib + 1
                break
            ib -= 1
        if seg_start is not None:
            seg = sql[seg_start:m.start()]
            seg_depth, has_on = 0, False
            for mo in re.finditer(r"[()]|\b(?:on|using)\b", seg, re.I):
                if in_lit(seg_start + mo.start()):
                    continue
                t = mo.group(0)
                if t == "(":
                    seg_depth += 1
                elif t == ")":
                    seg_depth -= 1
                elif seg_depth == 0:
                    has_on = True
            if has_on and seg.strip() and "lateral" not in seg.lower():
                p = m.end()
                while p < len(sql) and sql[p].isspace():
                    p += 1
                if p >= len(sql):
                    continue
                if sql[p] == "(":
                    depth_f, q = 0, p
                    while q < len(sql):
                        if sql[q] == "(":
                            depth_f += 1
                        elif sql[q] == ")":
                            depth_f -= 1
                            if depth_f == 0:
                                break
                        q += 1
                    q += 1
                else:
                    q = p
                    while q < len(sql) and (sql[q].isalnum()
                                            or sql[q] in "_.`"):
                        q += 1
                    if q == p:
                        continue
                r = q
                while r < len(sql) and sql[r].isspace():
                    r += 1
                r2 = r
                while r2 < len(sql) and (sql[r2].isalnum()
                                         or sql[r2] in "_`"):
                    r2 += 1
                alias = sql[r:r2]
                if alias and alias.lower() == "as":
                    r3 = r2
                    while r3 < len(sql) and sql[r3].isspace():
                        r3 += 1
                    r4 = r3
                    while r4 < len(sql) and (sql[r4].isalnum()
                                             or sql[r4] in "_`"):
                        r4 += 1
                    nxt = sql[r3:r4]
                    if nxt and nxt.lower() not in _FROM_KWS:
                        alias, r2 = nxt, r4
                    else:
                        alias = ""
                rend = (r2 if alias and alias.lower() not in _FROM_KWS
                        else q)
                right = sql[p:rend]
                return (
                    sql[:seg_start]
                    + f" {right} left {kind} join ({seg.strip()}) "
                    + sql[rend:]
                )
        # ---- left operand: scan backwards
        i = m.start() - 1
        while i >= 0 and sql[i].isspace():
            i -= 1
        if i < 0:
            continue
        lend = i + 1
        if sql[i] == ")":
            depth = 0
            while i >= 0:
                if sql[i] == ")":
                    depth += 1
                elif sql[i] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                i -= 1
            if i < 0:
                continue
            lstart = i
        else:
            # identifier (alias or bare table); maybe preceded by its
            # base: `( ... ) alias` or `table alias`
            j = i
            while j >= 0 and (sql[j].isalnum() or sql[j] in "_.`"):
                j -= 1
            w1 = sql[j + 1 : i + 1]
            if not w1 or w1.lower() in _FROM_KWS:
                continue
            lstart = j + 1
            k = j
            while k >= 0 and sql[k].isspace():
                k -= 1
            if k >= 0 and sql[k] == ")":
                depth = 0
                while k >= 0:
                    if sql[k] == ")":
                        depth += 1
                    elif sql[k] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    k -= 1
                if k < 0:
                    continue
                lstart = k
            elif k >= 0 and (sql[k].isalnum() or sql[k] in "_.`"):
                j2 = k
                while j2 >= 0 and (sql[j2].isalnum() or sql[j2] in "_.`"):
                    j2 -= 1
                w2 = sql[j2 + 1 : k + 1]
                if w2 and w2.lower() == "as":
                    # `base AS alias` — the base table sits before AS
                    k3 = j2
                    while k3 >= 0 and sql[k3].isspace():
                        k3 -= 1
                    j3 = k3
                    while j3 >= 0 and (sql[j3].isalnum()
                                       or sql[j3] in "_.`"):
                        j3 -= 1
                    w3 = sql[j3 + 1 : k3 + 1]
                    if w3 and w3.lower() not in _FROM_KWS:
                        lstart = j3 + 1
                elif w2 and w2.lower() not in _FROM_KWS:
                    lstart = j2 + 1
        left = sql[lstart:lend]
        # ---- right operand: scan forward from the join keyword
        p = m.end()
        while p < len(sql) and sql[p].isspace():
            p += 1
        if p >= len(sql):
            continue
        if sql[p] == "(":
            depth, q = 0, p
            while q < len(sql):
                if sql[q] == "(":
                    depth += 1
                elif sql[q] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                q += 1
            q += 1
        else:
            q = p
            while q < len(sql) and (sql[q].isalnum() or sql[q] in "_.`"):
                q += 1
            if q == p:
                continue
        # optional alias
        r = q
        while r < len(sql) and sql[r].isspace():
            r += 1
        r2 = r
        while r2 < len(sql) and (sql[r2].isalnum() or sql[r2] in "_`"):
            r2 += 1
        alias = sql[r:r2]
        if alias and alias.lower() == "as":
            # `base AS alias` — capture the aliased name too
            r3 = r2
            while r3 < len(sql) and sql[r3].isspace():
                r3 += 1
            r4 = r3
            while r4 < len(sql) and (sql[r4].isalnum() or sql[r4] in "_`"):
                r4 += 1
            nxt = sql[r3:r4]
            if nxt and nxt.lower() not in _FROM_KWS:
                alias, r2 = nxt, r4
            else:
                alias = ""
        rend = r2 if alias and alias.lower() not in _FROM_KWS else q
        right = sql[p:rend]
        return (
            sql[:lstart]
            + f"{right} left {kind} join {left}"
            + sql[rend:]
        )
    return None


def _split_select_items(s: str) -> list[str]:
    """Depth/quote-aware top-level comma split of a select list."""
    depth, buf, items, in_s = 0, [], [], None
    for ch in s:
        if in_s:
            buf.append(ch)
            if ch == in_s:
                in_s = None
            continue
        if ch in ("'", '"'):
            in_s = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    if "".join(buf).strip():
        items.append("".join(buf))
    return items


_COND_KW = {
    "and", "or", "not", "null", "true", "false", "between", "in", "like",
    "rlike", "regexp", "is", "case", "when", "then", "else", "end", "exists",
    "interval", "day", "month", "year", "hour", "minute", "second", "as",
    "distinct", "all", "any", "some", "escape", "div", "mod", "xor",
}


def _having_no_group(sql: str, force_where_merge: bool = False) -> str:
    """Doris/MySQL HAVING WITHOUT GROUP BY filters the PROJECTED row —
    `SELECT date_format(d,...) AS d FROM t HAVING d = 202245` compares
    the select-list ALIAS (Spark would resolve the base column instead).
    Rewrite to an outer filter over the projection:
    `SELECT * FROM (<select>) __hav WHERE <cond> [ORDER BY/LIMIT tail]`.
    Conservative: top-level SELECT/WITH only, no top-level GROUP BY, no
    aggregate calls inside the HAVING condition (those imply a global
    aggregate that must stay a HAVING). Pinned by
    correctness_p0/test_group_having_alias."""
    if not re.match(r"\s*(SELECT|WITH)\b", sql, re.I):
        return sql
    spans = _lit_spans(sql)

    def in_lit(i: int) -> bool:
        return any(a <= i < b for a, b in spans)

    # top-level clause keyword positions
    pos = {}
    depth, i, n = 0, 0, len(sql)
    while i < n:
        if in_lit(i):
            i += 1
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and (c.isalpha()) and (
            i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
        ):
            m = re.match(r"(GROUP|HAVING|ORDER|LIMIT)\b", sql[i:], re.I)
            if m:
                pos.setdefault(m.group(1).upper(), i)
                i += m.end()
                continue
        i += 1
    if "HAVING" not in pos or "GROUP" in pos:
        return sql
    h = pos["HAVING"]
    tail_at = min(
        [p for k, p in pos.items() if k in ("ORDER", "LIMIT") and p > h],
        default=n,
    )
    cond = sql[h + len("HAVING") : tail_at].strip().rstrip(";")
    if re.search(
        r"\b(count|sum|avg|min|max|stddev\w*|var\w*|group_concat|any_value"
        r"|collect_\w+|approx_\w+|percentile\w*|corr|covar\w*|bitmap_union\w*"
        r"|hll_union\w*|ndv)\s*\(",
        cond,
        re.I,
    ):
        return sql
    inner = sql[:h].strip()
    tail = sql[tail_at:].strip().rstrip(";")
    # the outer scope only exposes the PROJECTED columns — a tail that
    # orders by a qualified inner reference (ORDER BY alias1.pk) must
    # have it mapped to its select-list alias (alias1.pk AS field1 ->
    # field1); unmappable qualified refs keep the statement untouched
    if re.search(r"\b\w+\s*\.\s*`?\w", re.sub(r"'[^']*'|\"[^\"]*\"", "", tail)):
        sm = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?(.*?)\s+FROM\b", inner,
                      re.I | re.S)
        if sm is None:
            return sql

        def norm_ref(t: str) -> str:
            return re.sub(r"\s+|`", "", t).lower()

        amap = {}
        items = _split_select_items(sm.group(1))
        for it in items:
            am = re.search(r"\s+AS\s+(`?)(\w+)\1\s*$", it, re.I)
            if am:
                amap[norm_ref(it[: am.start()])] = am.group(2)

        def map_ref(m2: re.Match) -> str:
            return amap.get(norm_ref(m2.group(0)), m2.group(0))

        new_tail = re.sub(
            r"\b\w+\s*\.\s*`?\w+`?", map_ref, tail
        )
        if re.search(r"\b\w+\s*\.\s*`?\w",
                     re.sub(r"'[^']*'|\"[^\"]*\"", "", new_tail)):
            return sql  # an unmappable qualified ref remains
        tail = new_tail
    # Doris resolves HAVING names the projection does not expose against
    # the BASE scope (`... case when profit<200 ... AS new_profit ...
    # HAVING profit > 200`): materialize those refs as synthetic inner
    # columns and strip them back out with EXCEPT
    # windows evaluate AFTER HAVING (ANSI; pinned by test_qualify_query
    # select_12/13 goldens): when the select list computes OVER(...)
    # expressions, the outer-filter rewrite would feed the windows
    # UNFILTERED rows — merge the HAVING predicate into WHERE instead
    # (row-wise-equivalent: no aggregates (checked above), no grouping),
    # substituting select-list aliases with their expressions
    if force_where_merge or re.search(r"(?i)\bOVER\s*\(", inner):
        hm3 = re.match(r"(\s*SELECT\s+)(DISTINCT\s+)?", inner, re.I)
        if hm3 is None or hm3.group(2):
            return sql
        ispans3 = _lit_spans(inner)
        fm3, wh3, rel, k = None, None, 0, hm3.end()
        while k < len(inner):
            if any(a <= k < b for a, b in ispans3):
                k += 1
                continue
            c = inner[k]
            if c == "(":
                rel += 1
            elif c == ")":
                rel -= 1
            elif rel == 0 and c.isalpha() and not (
                inner[k - 1].isalnum() or inner[k - 1] == "_"
            ):
                if fm3 is None and re.match(r"(?i)FROM\b", inner[k:]):
                    fm3 = k
                elif re.match(r"(?i)WHERE\b", inner[k:]):
                    wh3 = k
                    break
            k += 1
        if fm3 is None:
            return sql
        amap3 = {}
        for it in _split_select_items(inner[hm3.end():fm3]):
            am = re.search(r"\s+AS\s+(`?)(\w+)\1\s*$", it, re.I) or re.search(
                r"\)\s+(`?)(\w+)\1\s*$", it
            )
            if am:
                amap3[am.group(2).lower()] = it[: am.start()].strip()
        cond3 = re.sub(
            r"(?<![\w.`'\"])[A-Za-z_]\w*(?!\s*\()(?![\w.])",
            lambda m3: (
                "(" + amap3[m3.group(0).lower()] + ")"
                if m3.group(0).lower() in amap3
                and not re.search(r"(?i)\bOVER\s*\(", amap3[m3.group(0).lower()])
                else m3.group(0)
            ),
            cond,
        )
        if re.search(r"(?i)\bOVER\s*\(", cond3):
            return sql  # HAVING over a window alias: keep untouched
        if wh3 is not None:
            old = inner[wh3 + 5:].strip()
            inner2 = inner[:wh3] + f"WHERE ({old}) AND ({cond3})"
        else:
            inner2 = inner.rstrip() + f" WHERE {cond3}"
        return inner2 + (f" {tail}" if tail else "")

    hm2 = re.match(r"(\s*SELECT\s+)(DISTINCT\s+)?", inner, re.I)
    fm_at = None
    if hm2:
        ispans = _lit_spans(inner)
        rel, k = 0, hm2.end()
        while k < len(inner):
            if any(a <= k < b for a, b in ispans):
                k += 1
                continue
            c = inner[k]
            if c == "(":
                rel += 1
            elif c == ")":
                rel -= 1
            elif (
                rel == 0
                and c in "fF"
                and not (inner[k - 1].isalnum() or inner[k - 1] == "_")
                and re.match(r"(?i)FROM\b", inner[k:])
            ):
                fm_at = k
                break
            k += 1
    extras: list[str] = []
    if hm2 and fm_at is not None and not hm2.group(2):
        sel_list = inner[hm2.end():fm_at]
        exposed = set()
        for it in _split_select_items(sel_list):
            am = re.search(r"\s+AS\s+(`?)(\w+)\1\s*$", it, re.I)
            if am:
                exposed.add(am.group(2).lower())
            else:
                it2 = it.strip().strip("`")
                nm = re.match(r"^(\w+\s+)?(`?)(\w+)\2$",
                              it2.split(".")[-1].strip())
                if re.match(r"^[\w.`\s]+$", it2) and nm:
                    exposed.add(nm.group(3).lower())
                    am2 = re.search(r"(`?)(\w+)\1\s*$", it2)
                    if am2:
                        exposed.add(am2.group(2).lower())

        def _matb(m3: re.Match) -> str:
            ref = m3.group(0)
            base = ref.split(".")[-1].strip("` ")
            if (
                base.lower() in _COND_KW
                or ("." not in ref and base.lower() in exposed)
            ):
                return ref
            extras.append(ref)
            return f"__hv{len(extras) - 1}"

        cond2 = re.sub(
            r"(?<![\w.`'\"])(?:\w+\s*\.\s*)?`?[A-Za-z_]\w*`?"
            r"(?!\s*\()(?![\w.])",
            lambda m3: _matb(m3)
            if not re.match(r"'", m3.group(0))
            else m3.group(0),
            re.sub(r"'[^']*'", lambda mq: "'" + "\x00" * (len(mq.group(0)) - 2) + "'", cond),
        )
        if extras:
            # restore literals in cond2 from the original by position
            # (placeholders only masked content INSIDE quotes)
            lit_iter = re.finditer(r"'[^']*'", cond)
            cond2 = re.sub(
                r"'\x00*'", lambda _m: next(lit_iter).group(0), cond2
            )
            inner = (
                inner[:fm_at].rstrip()
                + ", "
                + ", ".join(
                    f"{r} AS __hv{i}" for i, r in enumerate(extras)
                )
                + " "
                + inner[fm_at:]
            )
            exc = " EXCEPT (" + ", ".join(
                f"__hv{i}" for i in range(len(extras))
            ) + ")"
            return f"SELECT *{exc} FROM ({inner}) __hav WHERE {cond2}" + (
                f" {tail}" if tail else ""
            )
    return f"SELECT * FROM ({inner}) __hav WHERE {cond}" + (
        f" {tail}" if tail else ""
    )


def _rewrite_qualify(sql: str) -> str:
    """Doris QUALIFY (SelectHint QUALIFY clause, nereids
    LogicalQualify): filter applied AFTER window evaluation. Rewrite
    each QUALIFY-bearing SELECT block (innermost first) to
    `SELECT * [EXCEPT(__qw*)] FROM (<select + window cols>) __qv
    WHERE <cond> [tail]` — window expressions referenced directly in
    the condition are materialized as synthetic inner columns; alias
    references resolve against the projected row like Doris."""
    for _ in range(16):
        spans = _lit_spans(sql)

        def in_lit(i: int) -> bool:
            return any(a <= i < b for a, b in spans)

        # pick the DEEPEST qualify (innermost subquery first)
        best, best_depth = None, -1
        depth, i, n = 0, 0, len(sql)
        while i < n:
            if in_lit(i):
                i += 1
                continue
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif (
                c in "qQ"
                and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "_."))
                and re.match(r"(?i)QUALIFY\b", sql[i:])
            ):
                if depth >= best_depth:
                    best, best_depth = i, depth
                i += 7
                continue
            i += 1
        if best is None:
            return sql
        q = best
        # enclosing SELECT: scan backward at relative depth 0
        rel, j, sel_start, blk_open = 0, q - 1, None, 0
        while j >= 0:
            if not in_lit(j):
                c = sql[j]
                if c == ")":
                    rel += 1
                elif c == "(":
                    rel -= 1
                    if rel < 0:
                        blk_open = j + 1
                        break
                elif (
                    rel == 0
                    and c in "sS"
                    and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_"))
                    and re.match(r"(?i)SELECT\b", sql[j:])
                ):
                    sel_start = j
                    break
            j -= 1
        if sel_start is None:
            sel_start = blk_open
        # forward: condition ends at rel-0 ORDER/LIMIT, a closing ')',
        # or end of statement
        qe = q + len("QUALIFY")
        rel, k, cond_end, blk_end = 0, qe, None, n
        while k < n:
            if in_lit(k):
                k += 1
                continue
            c = sql[k]
            if c == "(":
                rel += 1
            elif c == ")":
                rel -= 1
                if rel < 0:
                    cond_end = cond_end if cond_end is not None else k
                    blk_end = k
                    break
            elif c == ";" and rel == 0:
                cond_end = cond_end if cond_end is not None else k
                blk_end = k
                break
            elif (
                rel == 0
                and cond_end is None
                and c.isalpha()
                and not (sql[k - 1].isalnum() or sql[k - 1] == "_")
                and re.match(r"(?i)(ORDER\s+BY|LIMIT)\b", sql[k:])
            ):
                cond_end = k
            k += 1
        if cond_end is None:
            cond_end = blk_end = n
        cond = sql[qe:cond_end].strip()
        tail = sql[cond_end:blk_end].strip()
        head = sql[sel_start:q].rstrip()
        # `HAVING profit > 200 QUALIFY ...`: the head is a complete
        # SELECT — apply the HAVING-without-GROUP-BY alias rewrite to it
        # now (after splicing it becomes a subquery the top-level-only
        # pass would miss)
        if re.search(r"(?i)\bHAVING\b", head):
            # QUALIFY windows evaluate after HAVING: the predicate must
            # filter rows BEFORE any window -> force the WHERE merge
            head = _having_no_group(head, force_where_merge=True)
        # materialize window expressions used directly in the condition
        winexprs = []
        out = []
        pos = 0
        for om in re.finditer(r"(?i)\bOVER\s*\(", cond):
            if om.start() < pos:
                continue
            # backward: fn(...) immediately before OVER
            b = om.start() - 1
            while b >= 0 and cond[b].isspace():
                b -= 1
            if b < 0 or cond[b] != ")":
                continue
            depth2, b2 = 0, b
            while b2 >= 0:
                if cond[b2] == ")":
                    depth2 += 1
                elif cond[b2] == "(":
                    depth2 -= 1
                    if depth2 == 0:
                        break
                b2 -= 1
            fs = b2
            while fs > 0 and (cond[fs - 1].isalnum() or cond[fs - 1] == "_"):
                fs -= 1
            # forward: close the OVER(...) spec
            depth2, f2 = 1, om.end()
            while f2 < len(cond) and depth2:
                if cond[f2] == "(":
                    depth2 += 1
                elif cond[f2] == ")":
                    depth2 -= 1
                f2 += 1
            out.append(cond[pos:fs])
            out.append(f"__qw{len(winexprs)}")
            winexprs.append(cond[fs:f2])
            pos = f2
        out.append(cond[pos:])
        cond2 = "".join(out)
        if winexprs:
            # inject after the select list: before this block's FROM —
            # scan HEAD itself (it may have been rewritten above)
            hspans = _lit_spans(head)
            fm_at = None
            rel, k = 0, 0
            while k < len(head):
                if any(a <= k < b for a, b in hspans):
                    k += 1
                    continue
                c = head[k]
                if c == "(":
                    rel += 1
                elif c == ")":
                    rel -= 1
                elif (
                    rel == 0
                    and c in "fF"
                    and k > 0
                    and not (head[k - 1].isalnum() or head[k - 1] == "_")
                    and re.match(r"(?i)FROM\b", head[k:])
                ):
                    fm_at = k
                    break
                k += 1
            if fm_at is None:
                return sql
            inner = (
                head[:fm_at].rstrip()
                + ", "
                + ", ".join(f"{e} AS __qw{i}" for i, e in enumerate(winexprs))
                + " "
                + head[fm_at:]
            )
            exc = " EXCEPT (" + ", ".join(
                f"__qw{i}" for i in range(len(winexprs))
            ) + ")"
        else:
            inner, exc = head, ""
        new_block = (
            f"SELECT *{exc} FROM ({inner}) __qv WHERE {cond2}"
            + (f" {tail}" if tail else "")
        )
        sql = sql[:sel_start] + new_block + sql[blk_end:]
    return sql


def dialect(sql: str) -> str:
    """MySQL/Doris spellings -> Spark SQL (the FE's dialect layer)."""
    if re.search(r"(?i)(?<![\w.])QUALIFY\b", sql):
        sql = _rewrite_qualify(sql)
    if re.search(r"(?i)\bmap_agg", sql) and re.search(
        r"(?i)\[\s*NULL\s*\]", sql
    ):
        # map_agg keeps NULL keys behind a NUL sentinel (Spark maps ban
        # null keys) — a [null] subscript over one of its maps must
        # look up that sentinel (query_p0/aggregate/map_agg.groovy
        # test_null); sentinel lookups on maps WITHOUT null keys return
        # NULL, same as Doris. Scoped: only subscripts whose base is a
        # map_agg(..) call or a non-array-typed name (array[NULL] must
        # stay a NULL index, and other maps' [NULL] stays NULL anyway
        # but string-keying an int-keyed map would break analysis).
        sql = _rewrite_null_subscript(sql)
    if _RIGHT_SEMI.search(sql):
        sql = _rewrite_right_semi_anti(sql)
    if re.search(r"(?i)\bUNNEST\s*\(", sql):
        from doris_spark.plans.unnest_rewrite import rewrite_unnest

        sql = rewrite_unnest(sql)
    if re.search(r"(?i)\bHAVING\b", sql):
        sql = _having_no_group(sql)
    if any(ord(ch) > 127 for ch in sql):
        sql = _quote_unicode_idents(sql)
    # dotted/slashed date literals ('2024.12.12') — normalize BEFORE the
    # cast rewrites so AS DATETIME forms see a parseable literal
    sql = _DOTTED_DATELIT.sub(_norm_dotted_datelit, sql)
    # MySQL CONVERT(x USING charset): the collation effect on ORDER BY.
    # Chinese charsets sort by the *_chinese_ci collation (ASCII first,
    # then Han by PINYIN — query_p0/sort golden 多<睿<丝), which ICU's zh
    # collation reproduces; other charsets sort by their byte order.
    def _convert_using(m: re.Match) -> str:
        x, cs = m.group(1), m.group(2).lower()
        if cs in ("gbk", "gb2312", "gb18030"):
            return (
                f"struct(CAST({x} RLIKE '[^\\\\x00-\\\\x7F]' AS INT), "
                f"collate({x}, 'zh'))"
            )
        return f"__charset_bytes({x}, '{cs}')"

    sql = re.sub(
        r"\bconvert\s*\(\s*((?:[^()']|'[^']*'|\([^()]*\))+?)\s+using\s+(\w+)\s*\)",
        _convert_using,
        sql,
        flags=re.I,
    )
    # double literals past DBL_MAX: Doris saturates to +/-Infinity
    # (1e309 stores/compares as Infinity); Spark's parser rejects the
    # literal outright (INVALID_NUMERIC_LITERAL_RANGE) —
    # conditional_functions/test_query_in.groovy in33-36
    def _inf_lit(m: re.Match) -> str:
        try:
            import math

            if math.isinf(float(m.group(0))):
                sign = "-" if m.group(0).lstrip().startswith("-") else ""
                return f"CAST('{sign}Infinity' AS DOUBLE)"
        except (ValueError, OverflowError):
            pass
        return m.group(0)

    if re.search(r"\d[eE]\+?\d{3}", sql):
        sql = _sub_outside_literals(
            r"(?<![\w.])\d+(?:\.\d+)?[eE]\+?\d{3,}\b", _inf_lit, sql
        )
    # literals wider than DECIMAL256 (76 digits) are DOUBLE in Doris;
    # Spark's parser rejects them (DECIMAL_PRECISION_EXCEEDS_MAX) —
    # math_functions/test_format_round.groovy's 324-digit subnormals
    def _wide_lit(m: re.Match) -> str:
        if sum(c.isdigit() for c in m.group(0)) > 76:
            return f"CAST('{m.group(0)}' AS DOUBLE)"
        return m.group(0)

    if re.search(r"\d{20}", sql):
        sql = _sub_outside_literals(
            r"(?<![\w.])\d+\.\d{39,}(?![\w.])|"
            r"(?<![\w.])\d{39,}(?:\.\d+)?(?![\w.])",
            _wide_lit, sql,
        )
    # CAST(x AS JSON) as an ARGUMENT of a json function: Spark has no
    # JSON type — parse+normalize to the engine's JSON text form. Only
    # the function-argument position is rewritten (top-level SELECT
    # casts go through the column_cast tier) —
    # conditional_functions/test_if.groovy jsonb_exists_path cases
    sql = _sub_outside_literals(
        r"(?i)(\b(?:jsonb?_|explode_json_)\w+\s*\(\s*)CAST\s*\("
        r"((?:[^()']|'[^']*')+?)\s+AS\s+JSONB?\s*\)",
        lambda m: f"{m.group(1)}CAST(parse_json({m.group(2)}) AS STRING)",
        sql,
    )
    # MySQL IN-list coercion (conditional_functions/test_query_in):
    # (a) a literal list mixing bare numerics and QUOTED numerics
    # compares numerically in Doris ("0" casts to the column's decimal
    # type); Spark coerces the COLUMN to STRING instead — unquote the
    # numeric strings. (b) an explicitly string-CAST lhs against an
    # all-numeric list compares as DOUBLE in MySQL ('3' matches 3.000).
    def _num(x: str):
        return re.fullmatch(r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", x)

    def _in_mixed(m: re.Match) -> str:
        items = [x.strip() for x in m.group(2).split(",")]

        def qnum(x: str):
            return (len(x) >= 3 and x[0] == x[-1] and x[0] in "'\""
                    and _num(x[1:-1].strip()))

        if (
            items
            and any(_num(x) for x in items)
            and any(qnum(x) for x in items)
            and all(_num(x) or qnum(x) or x.upper() == "NULL"
                    for x in items)
        ):
            new = [x[1:-1].strip() if qnum(x) else x for x in items]
            return f"{m.group(1)}{', '.join(new)}{m.group(3)}"
        return m.group(0)

    if re.search(r"(?i)\bIN\s*\(", sql):
        # paren-free list body only — keeps the scan LINEAR (a lazy
        # alternation-quantifier here backtracked catastrophically on
        # long function-call lists); lists containing parens are never
        # candidates for the literal-coercion rewrite anyway
        sql = _sub_outside_literals(
            r"(?i)\b(IN\s*\(\s*)([^()]*?)(\s*\))",
            _in_mixed, sql)

        def _cast_char_in(m: re.Match) -> str:
            items = [x.strip() for x in m.group(4).split(",")]
            if items and all(_num(x) for x in items):
                return (
                    f"CAST({m.group(1)} AS DOUBLE) "
                    f"{m.group(3) or ''}IN ({m.group(4)})"
                )
            return m.group(0)

        sql = _sub_outside_literals(
            r"(?i)\bCAST\s*\(([^()]+)\s+AS\s+"
            r"(?:CHAR|VARCHAR(\(\d+\))?|STRING|TEXT)\s*\)\s*"
            r"(NOT\s+)?IN\s*\(([^()]*)\)",
            _cast_char_in, sql)
    # MySQL numeric truthiness for a bare integer WHERE/HAVING predicate
    sql = _sub_outside_literals(
        r"\b(WHERE|HAVING)\s+(\d+)\s*(?=;|$|\)|\bGROUP\b|\bORDER\b|\bLIMIT\b"
        r"|\bUNION\b|\bHAVING\b|\bWHERE\b)",
        lambda m: f"{m.group(1)} ({m.group(2)} <> 0) ",
        sql,
        flags=re.I,
    )
    # a bare NULL predicate filters every row (MySQL boolean context);
    # Spark rejects a VOID filter (pinned by empty_relation/
    # eliminate_empty.groovy `where Null` union/intersect/except cases)
    sql = _sub_outside_literals(
        r"\b(WHERE|HAVING)\s+NULL\s*(?=;|$|\)|\bGROUP\b|\bORDER\b|\bLIMIT\b"
        r"|\bUNION\b|\bINTERSECT\b|\bEXCEPT\b|\bHAVING\b)",
        lambda m: f"{m.group(1)} CAST(NULL AS BOOLEAN) ",
        sql,
        flags=re.I,
    )
    # MySQL LIMIT offset,count -> LIMIT count OFFSET offset
    sql = _sub_outside_literals(
        r"\bLIMIT\s+(\d+)\s*,\s*(\d+)",
        r"LIMIT \2 OFFSET \1",
        sql,
        flags=re.I,
    )
    # Doris join distribution hints `join [shuffle|broadcast|colocate|
    # bucket] t` are execution knobs, not semantics
    sql = _sub_outside_literals(
        r"(\bJOIN\s*)\[\s*(shuffle|broadcast|colocate|bucket)\s*\]",
        r"\1",
        sql,
        flags=re.I,
    )
    # Doris tolerates whitespace around the qualifier dot (alias1 . col)
    sql = re.sub(r"(?<=[\w`])[ \t]+\.[ \t]*(?=[\w`])", ".", sql)
    # date/datetime literal cast to a numeric type reads as the packed
    # digit form (19700506); Spark's cast would yield NULL
    def _date_numcast(m: re.Match) -> str:
        digits = re.sub(r"\D", "", m.group(2))
        if m.group(1).upper() == "TIMESTAMP" or len(digits) > 8:
            digits = (digits + "00000000000000")[:14]
        return f"CAST({digits} AS {m.group(3)})"

    sql = re.sub(
        r"CAST\s*\(\s*(DATE|TIMESTAMP)\s*'([^']*)'\s+AS\s+"
        r"(FLOAT|DOUBLE|INT|INTEGER|BIGINT|SMALLINT|LARGEINT|DECIMAL[^)]*)\)",
        _date_numcast,
        sql,
        flags=re.I,
    )
    # MySQL/Doris treat year 0 as NON-leap: '0000-02-29' is invalid ->
    # NULL (proleptic Gregorian — Spark's calendar — has it as a valid
    # leap day, and the year-0 result would break Python rendering)
    sql = re.sub(
        r"CAST\s*\(\s*'0000-02-29[^']*'\s*AS\s+"
        r"(DATE(?:V[12])?|DATETIME(?:V[12])?\s*(?:\(\s*\d\s*\))?)\s*\)",
        lambda m: "CAST(NULL AS "
        + ("DATE" if m.group(1).upper().startswith("DATE") and not
           m.group(1).upper().startswith("DATETIME") else "TIMESTAMP")
        + ")",
        sql,
        flags=re.I,
    )
    # packed-digit date/datetime LITERAL casts with fractional seconds:
    # Doris parses 'YYYYMMDDHHMMSS.fffffff' rounding the 7th fractional
    # digit half-up — compute the literal here (Spark rejects the form).
    # Runs BEFORE _cast_time_dt0 so the bare AS-DATETIME rounding
    # wrapper can't swallow the packed literal, and a DATE target
    # TRUNCATES the time part (no midnight carry from the fraction).
    def _packed_dt(digits: str, frac: str, typ: str, orig: str) -> str:
        import datetime as _dt
        from decimal import ROUND_HALF_UP, Decimal

        try:
            if len(digits) == 8:
                base = _dt.datetime.strptime(digits, "%Y%m%d")
            else:
                base = _dt.datetime.strptime(digits, "%Y%m%d%H%M%S")
            if frac and typ.upper() != "DATE":
                us = Decimal(frac).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP)
                base += _dt.timedelta(seconds=float(us))
        except (ValueError, OverflowError):
            return orig
        if typ.upper() == "DATE":
            return f"DATE'{base.date().isoformat()}'"
        return "TIMESTAMP'" + base.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"

    sql = re.sub(
        r"(?i)\bCAST\s*\(\s*'(\d{8}|\d{14})(\.\d+)?'\s+AS\s+"
        r"(DATE|DATETIME|TIMESTAMP)(?:V2)?(?:\s*\(\s*\d+\s*\))?\s*\)",
        lambda m: _packed_dt(
            m.group(1), m.group(2) or "", m.group(3), m.group(0)),
        sql)
    sql = re.sub(
        r"(?i)\b(?:timestamp|datetime)\s*'(\d{14})(\.\d+)?'",
        lambda m: _packed_dt(
            m.group(1), m.group(2) or "", "TIMESTAMP", m.group(0)),
        sql)
    # CAST(<date/datetime COLUMN> AS numeric): Doris yields the packed
    # digits (cast('2012-03-14' date AS BIGINT) = 20120314) — only when
    # DDL-time type hints identify the column (harness/table contexts);
    # unknown columns keep Spark semantics
    def _cast_dt_col_numeric(m: re.Match) -> str:
        from doris_spark.plans import type_hints as _th

        t = _th.lookup(m.group(1))
        if t is None:
            return m.group(0)
        if re.match(r"datetime", t):
            fmt = "yyyyMMddHHmmss"
        elif re.match(r"date(v2)?$", t):
            fmt = "yyyyMMdd"
        else:
            return m.group(0)
        return (f"CAST(date_format(`{m.group(1)}`, '{fmt}') "
                f"AS {m.group(2)})")

    sql = re.sub(
        r"(?i)\bCAST\s*\(\s*`?(\w+)`?\s+AS\s+"
        r"(BIGINT|LARGEINT|INT|INTEGER|SMALLINT|TINYINT|DOUBLE|FLOAT"
        r"|DECIMAL(?:V2|V3)?\s*(?:\(\s*\d+\s*(?:,\s*\d+)?\s*\))?)\s*\)",
        _cast_dt_col_numeric, sql)
    sql = _timediff_scale(sql)
    s = _cast_time_dt0(sql)
    # hour/minute/second/microsecond over the TIME shim route to the
    # time-part kernel (prefix swap keeps parens balanced)
    s = re.sub(
        r"\b(hour|minute|second|microsecond)\s*\(\s*(__doris_time(?:_cast)?\()",
        lambda m: f"__time_part('{m.group(1).lower()}', {m.group(2)}",
        s,
        flags=re.I,
    )
    # MySQL TIME(x) extracts the time part (TIME shim string). Quote-aware:
    # never rewrite inside string literals; never match word-suffixed
    # names (maketime, current_time have a word char before TIME).
    def _time_fn(text: str) -> str:
        out, i, n, in_str = [], 0, len(text), None
        pat = re.compile(r"TIME\s*\(", re.I)
        while i < n:
            c = text[i]
            if in_str:
                out.append(c)
                if c == in_str:
                    in_str = None
                i += 1
                continue
            if c in ("'", '"'):
                in_str = c
                out.append(c)
                i += 1
                continue
            m = pat.match(text, i)
            if m and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "_.")):
                out.append("__doris_time(")
                i = m.end()
                continue
            out.append(c)
            i += 1
        return "".join(out)

    s = _time_fn(s)
    # months/quarters/years_add|_sub on an OFFSET-suffixed literal: Doris
    # adds calendar months in the literal's own zone, THEN converts to the
    # session zone (the reverse order clamps end-of-month differently —
    # e.g. months_add('2024-02-29 15:45-05:00', 1) is Mar 30 in +08:00).
    def _tz_month_arith(m):
        unit_mult = {"months": 1, "quarters": 3, "years": 12}
        fn, kind = m.group(1).lower(), m.group(2).lower()
        naive, tz, cnt = m.group(3), m.group(4), int(m.group(5))
        n_months = unit_mult[fn] * cnt * (1 if kind == "add" else -1)
        mx = "TIMESTAMP '9999-12-31 23:59:59.999999'"
        inp = (
            f"from_utc_timestamp(to_utc_timestamp(CAST('{naive.strip()}' AS "
            f"TIMESTAMP), '{tz}'), current_timezone())"
        )
        res = (
            f"from_utc_timestamp(to_utc_timestamp(timestampadd(MONTH, {n_months}, "
            f"CAST('{naive.strip()}' AS TIMESTAMP)), '{tz}'), current_timezone())"
        )
        # Doris's DATETIME tops at 9999-12-31: an input whose session-zone
        # rendering (or result) passes the ceiling is NULL, not an error
        return f"CASE WHEN {inp} > {mx} OR {res} > {mx} THEN NULL ELSE {res} END"

    s = re.sub(
        r"\b(months|quarters|years)_(add|sub)\s*\(\s*'([^']*?)\s*([+-]\d{2}:\d{2})'\s*,\s*(-?\d+)\s*\)",
        _tz_month_arith,
        s,
        flags=re.I,
    )
    # DECIMALV2/V3 are the reference's storage spellings of DECIMAL
    s = re.sub(r"\bDECIMALV[23]\b", "DECIMAL", s, flags=re.I)
    # DECIMAL256 CASTs with a TYPED source first: the source type bounds
    # the integral digits actually possible, so the narrowed DECIMAL128
    # can keep the declared scale when it fits (query_p0/join
    # test_join_decimal256: cast(decimal(38,6) AS decimal(76,6)) must
    # keep .000001 fractions EXACT for join keys and renders — the
    # integral-worst-case fallback below would zero the scale)
    s = _narrow_dec256_casts(s)
    # DECIMAL256 (p > 38) narrows to DECIMAL128 PRESERVING THE INTEGRAL
    # RANGE: scale gives way (a (76,38) holds 38 integer digits — capping
    # to (38,38) would overflow every integer; (38,0) keeps them and the
    # comparator forgives the dropped trailing scale zeros)
    s = re.sub(
        r"\bDECIMAL\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)",
        lambda m: (
            m.group(0) if int(m.group(1)) <= 38 else
            f"DECIMAL(38,{max(0, 38 - (int(m.group(1)) - int(m.group(2))))})"
        ),
        s,
        flags=re.I,
    )
    # Doris resolves timezone names case-insensitively ('pacific/galapagos');
    # the JVM is strict — canonicalize literal zone names in convert_tz
    s = re.sub(
        r"(convert_tz\s*\()([^;]*?)(\))",
        lambda m: m.group(1) + re.sub(
            r"'([A-Za-z]+/[A-Za-z_+\-0-9]+)'",
            lambda z: f"'{_tz_canon(z.group(1))}'",
            m.group(2),
        ) + m.group(3),
        s,
        flags=re.I,
    )
    s = re.sub(r"\bAS\s+DATETIMEV[12]\b", "AS TIMESTAMP", s, flags=re.I)
    s = re.sub(r"\bAS\s+DATETIME\s*\(\s*\d+\s*\)", "AS TIMESTAMP", s, flags=re.I)
    s = re.sub(r"\bAS\s+DATETIME\b", "AS TIMESTAMP", s, flags=re.I)
    s = re.sub(r"\bAS\s+DATEV[12]\b", "AS DATE", s, flags=re.I)
    s = re.sub(r"\bAS\s+SIGNED\b", "AS BIGINT", s, flags=re.I)
    # boolean -> string renders as 1/0 in Doris (nested-literal form;
    # must run BEFORE the generic VARCHAR-cast float-format tier below)
    s = re.sub(
        r"(?i)\bCAST\s*\(\s*(CAST\s*\(\s*[^()]*?\s+AS\s+BOOLEAN\s*\)|TRUE|"
        r"FALSE)\s+AS\s+(?:VARCHAR|CHAR|STRING|TEXT)\s*(?:\(\s*\d+\s*\))?"
        r"\s*\)",
        lambda m: (f"CASE WHEN {m.group(1)} THEN '1' "
                   f"WHEN NOT {m.group(1)} THEN '0' END"),
        s)
    # Doris renders integral DOUBLE/FLOAT values without the trailing
    # '.0' when cast to VARCHAR/CHAR (%g-style) — inline the strip so it
    # stays legal inside Sort/Generate (no SQL UDF)
    s = re.sub(
        r"CAST\s*\(((?:[^()']|'[^']*'|\((?:[^()']|'[^']*'|\([^()]*\))*\))+?)"
        r"\s+AS\s+(?:VAR)?CHAR(?:\s*\(\s*\d+\s*\))?\s*\)",
        lambda m: (
            "(CASE WHEN typeof({x}) IN ('double', 'float') THEN "
            "regexp_replace(CAST(({x}) AS STRING), '^(-?[0-9]+)\\\\.0$', '$1') "
            "ELSE CAST(({x}) AS STRING) END)"
        ).format(x=m.group(1)),
        s,
        flags=re.I,
    )
    # length-less VARCHAR/CHAR casts (MySQL allows them) -> STRING
    s = re.sub(r"\bAS\s+(VAR)?CHAR\b(?!\s*\()", "AS STRING", s, flags=re.I)
    # MySQL double-quoted ALIASES (Spark reads "..." as a string literal)
    # \w is unicode-aware: utf8 identifiers ("测试") alias fine
    s = re.sub(r'(\bAS\s+)"([^\W\d]\w*)"', r"\1`\2`", s, flags=re.I)
    # AS-less double-quoted alias after a call: `SUBSTRING(..) "别名"`
    s = re.sub(
        r'(\))\s+"([^\W\d]\w*)"(\s*(?:,|$|\bFROM\b))',
        r"\1 AS `\2`\3", s, flags=re.I)
    # MySQL single-quoted aliases: AS 'str' / AS '' (any content —
    # nereids_syntax_p0/select_const.groovy). Literal-aware: an AS
    # inside a string literal (e.g. concat('a AS ', 'b')) must not be
    # treated as an alias opener; empty aliases get a placeholder name
    # (column names are compared positionally).
    s = _sub_outside_literals(
        r"(\bAS\s+)'([^']*)'",
        lambda m: m.group(1) + "`" + (m.group(2) or "__empty_alias") + "`",
        s,
        flags=re.I,
    )
    # MySQL string-literal alias directly after END / ')' (CASE ... END
    # 'alias' FROM — query_p0/subquery sql14); only before , or FROM so
    # predicate literals are never touched
    s = _sub_outside_literals(
        r"(\bEND|\))\s+'([^']+)'(\s*(?:,|FROM\b))",
        r"\1 AS `\2`\3",
        s,
        flags=re.I,
    )
    # session-variable hints are execution knobs, not semantics
    s = re.sub(r"/\*\+\s*SET_VAR\s*\([^)]*\)\s*\*/", " ", s, flags=re.I)
    s = re.sub(r"/\*\+\s*SET\s+\w+\s*=\s*\w+\s*\*/", " ", s, flags=re.I)

    # Doris planner hints Spark's parser rejects (space-separated args,
    # {}-groups): leading(join order), ordered, use/no_use_cbo_rule,
    # use_mv/no_use_mv (query_p0/hint/*.groovy). The hint only steers
    # the optimizer — results are identical — so strip the spec; Spark
    # hints (broadcast etc.) inside the same comment are kept.
    def _doris_hints(m: re.Match) -> str:
        body = m.group(1)
        body = re.sub(
            r"\b(?:leading|use_cbo_rule|no_use_cbo_rule|use_mv|no_use_mv)"
            r"\s*\([^()]*(?:\([^()]*\)[^()]*)*\)|\bordered\b",
            " ",
            body,
            flags=re.I,
        )
        return f"/*+ {body} */" if body.strip() else " "

    if re.search(r"/\*\+[^*]*\b(?:leading|ordered|use_mv|no_use_mv|"
                 r"use_cbo_rule|no_use_cbo_rule)\b", s, re.I):
        s = re.sub(r"/\*\+(.*?)\*/", _doris_hints, s, flags=re.S)
    # Doris full-text MATCH operators over a literal query -> tokenized
    # predicates (operators/textops.py semantics, codegen-friendly)
    def _match_repl(m: re.Match) -> str:
        col, kind = m.group(1), (m.group(2) or "_any").lower()
        q = m.group(3).replace("'", "''")
        norm = f"regexp_replace(lower(trim({col})), '\\\\s+', ' ')"
        terms = q.lower().split()
        if kind in ("_any", "_all"):
            parts = [
                f"array_contains(split({norm}, ' '), '{t}')" for t in terms
            ]
            joiner = " OR " if kind == "_any" else " AND "
            return "(" + (joiner.join(parts) or "false") + ")"
        phrase = " ".join(terms)
        if kind == "_phrase":
            return f"(instr(concat(' ', {norm}, ' '), ' {phrase} ') > 0)"
        return f"(instr(concat(' ', {norm}), ' {phrase}') > 0)"

    s = re.sub(
        r"([\w.`]+)\s+MATCH(_ANY|_ALL|_PHRASE_PREFIX|_PHRASE)?\s+'([^']*)'",
        _match_repl,
        s,
        flags=re.I,
    )
    # MySQL GROUP BY <key> ASC/DESC implies ordering by the keys; keys
    # may be a multi-item list, followed by WITH ROLLUP / HAVING. The
    # direction markers strip from the grouping list and re-emit as an
    # ORDER BY after the HAVING clause (unless an explicit ORDER BY
    # already follows, which wins).
    s = _group_by_dirs(s)
    # Doris evaluates a RANGE frame starting at CURRENT ROW from the
    # PHYSICAL current row, not the first peer (pinned by
    # correctness_p0/test_first_value_window: tied ORDER BY values get
    # their own row's first_value) — Spark's standard RANGE would widen
    # the frame to all peers, so spell it as the equivalent ROWS frame
    s = re.sub(
        r"\bRANGE(\s+BETWEEN\s+CURRENT\s+ROW\s+AND\s+UNBOUNDED\s+FOLLOWING)",
        r"ROWS\1",
        s,
        flags=re.I,
    )
    # Doris first_value/last_value take the ignore-null flag as 0/1
    # (BE window function signature); Spark wants a boolean literal
    s = re.sub(
        r"\b(first_value|last_value)\s*\(((?:[^(),']|'[^']*'|\([^()]*\))+),\s*(0|1|true|false)\s*\)",
        lambda m: f"{m.group(1)}({m.group(2)}, "
        + ("true" if m.group(3).lower() in ("1", "true") else "false")
        + ")",
        s,
        flags=re.I,
    )
    # windowed bitmap aggregates: the OVER clause must attach to a real
    # Spark aggregate, so expand the bitmap combinator around a windowed
    # collect_list (bitmap = sorted array<bigint> representation)
    _W = r"(over\s*\((?:[^()']|'[^']*'|\([^()]*\))*\))"
    _isect = (
        "aggregate(collect_list({x}), CAST(NULL AS ARRAY<BIGINT>), "
        "(acc, e) -> CASE WHEN acc IS NULL THEN e "
        "ELSE array_intersect(acc, e) END, "
        "acc -> coalesce(acc, CAST(array() AS ARRAY<BIGINT>)))"
    )
    _union = "array_distinct(flatten(collect_list({x})))"
    for inner_name, inner_tpl in (
        ("bitmap_union", _union),
        ("bitmap_intersect", _isect),
    ):
        s = re.sub(
            r"\bBITMAP_UNION_COUNT\s*\(\s*" + inner_name
            + r"\s*\(([^()]+)\)\s*\)\s*" + _W,
            lambda m, t=inner_tpl: (
                "size(array_distinct(flatten(collect_list("
                + t.format(x=m.group(1))
                + f") {m.group(2)})))"
            ),
            s,
            flags=re.I,
        )
    # DISTINCT aggregates as window functions (Spark refuses them):
    # count/sum/avg(distinct x) over W -> fold over collect_set(x) over W
    def _distinct_win(m: re.Match) -> str:
        fn, x, w = m.group(1).lower(), m.group(2), m.group(3)
        cs = f"collect_set({x}) {w}"
        if fn == "count":
            return f"size({cs})"
        if fn == "group_concat":
            return f"array_join(array_sort({cs}), ',')"
        if fn == "sum":
            return f"aggregate({cs}, CAST(0 AS DOUBLE), (a, e) -> a + e)"
        return (
            f"(aggregate({cs}, CAST(0 AS DOUBLE), (a, e) -> a + e) "
            f"/ size({cs}))"
        )

    s = re.sub(
        r"\b(count|sum|avg|group_concat)\s*\(\s*distinct\s+"
        r"((?:[^()']|'[^']*'|\([^()]*\))+)\)"
        r"\s*(over\s*\((?:[^()']|'[^']*'|\([^()]*\))*\))",
        _distinct_win,
        s,
        flags=re.I,
    )
    # lag/lead require an ordered window in Spark; Doris tolerates a
    # bare PARTITION BY (order = input order) — add a constant ordering
    s = re.sub(
        r"\b((?:lag|lead|row_number|rank|dense_rank|ntile)\s*\([^()]*\)"
        r"\s+over\s*\()([^()]*)\)",
        lambda m: m.group(0)
        if re.search(r"order\s+by", m.group(2), re.I)
        else f"{m.group(1)}{m.group(2)} ORDER BY 1)",
        s,
        flags=re.I,
    )
    # current_timestamp(n)/now(n): fractional-second precision argument
    s = re.sub(
        r"\b(current_timestamp|now|localtimestamp)\s*\(\s*(\d)\s*\)",
        lambda m: _dt_round_expr("current_timestamp()", int(m.group(2))),
        s,
        flags=re.I,
    )
    # LARGEINT (int128) narrows to the documented DECIMAL(38,0) backing;
    # the exact 'decimal(38,0)' typeof doubles as the largeint marker
    s = re.sub(r"\bAS\s+LARGEINT\b", "AS DECIMAL(38,0)", s, flags=re.I)
    # Doris string->boolean accepts t/f/on/off/yes/no/true/false/0/1
    # (BE cast table; Spark lacks on/off) — fold literal forms
    _BOOL_WORDS = {
        "1": "TRUE", "t": "TRUE", "true": "TRUE", "yes": "TRUE",
        "on": "TRUE", "0": "FALSE", "f": "FALSE", "false": "FALSE",
        "no": "FALSE", "off": "FALSE",
    }

    def _bool_lit(m: re.Match) -> str:
        v = (m.group(1) if m.group(1) is not None else m.group(2))
        return _BOOL_WORDS.get(v.strip().lower(), "CAST(NULL AS BOOLEAN)")

    s = re.sub(
        r"(?i)\bCAST\s*\(\s*(?:'([^']*)'|\"([^\"]*)\")\s+AS\s+BOOLEAN\s*\)",
        _bool_lit, s)
    # MySQL/Doris truthiness for IS [NOT] TRUE/FALSE: any non-zero
    # numeric is true, unparseable strings are NULL (-1 IS TRUE = true;
    # Spark's `x <=> true` coerces TRUE to the numeric type instead).
    # Wrap the operand in CAST(.. AS BOOLEAN); operand extent is a
    # standalone literal/identifier/paren-group (an arithmetic chain is
    # left alone — Spark already groups it correctly)
    def _is_bool_sub(src: str) -> str:
        pat = re.compile(r"\bIS\s+(NOT\s+)?(TRUE|FALSE)\b", re.I)
        # matches inside string literals must be skipped ('x IS TRUE'
        # is data, not an operator); right-to-left processing keeps the
        # spans of yet-unvisited (earlier) matches valid after an edit
        lit = _lit_spans(src)
        for m in reversed(list(pat.finditer(src))):
            if any(a <= m.start() < b for a, b in lit):
                continue
            i = m.start() - 1
            while i >= 0 and src[i].isspace():
                i -= 1
            if i < 0:
                continue
            end = i + 1
            if src[i] == ")":
                depth = 0
                while i >= 0:
                    if src[i] == ")":
                        depth += 1
                    elif src[i] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    i -= 1
                if i < 0:
                    continue
                j = i - 1
                while j >= 0 and (src[j].isalnum() or src[j] in "_.`"):
                    j -= 1
                start = j + 1
            elif src[i] in "'\"":
                q = src[i]
                j = i - 1
                while j >= 0 and src[j] != q:
                    j -= 1
                if j < 0:
                    continue
                start = j
            elif src[i].isalnum() or src[i] in "_.`":
                j = i
                while j >= 0 and (src[j].isalnum() or src[j] in "_.`"):
                    j -= 1
                start = j + 1
                tok = src[start:end].upper()
                if tok in ("TRUE", "FALSE", "NULL", "NOT", "UNKNOWN"):
                    continue
            else:
                continue
            # optional unary sign directly attached to a standalone
            # operand (previous non-space is not a word/')' — else it's
            # binary arithmetic and we leave the whole chain alone)
            k = start - 1
            while k >= 0 and src[k].isspace():
                k -= 1
            if k >= 0 and src[k] in "+-":
                k2 = k - 1
                while k2 >= 0 and src[k2].isspace():
                    k2 -= 1
                if k2 >= 0 and (src[k2].isalnum() or src[k2] in ")`_"):
                    # word before the sign: a keyword means unary
                    # (SELECT -1 IS TRUE); an identifier/literal means
                    # binary arithmetic — leave the chain alone
                    j3 = k2
                    while j3 >= 0 and (src[j3].isalnum() or src[j3] == "_"):
                        j3 -= 1
                    w = src[j3 + 1 : k2 + 1].lower()
                    if w in ("select", "when", "then", "else", "and",
                             "or", "not", "where", "having", "on", "by",
                             "in", "return", "returns", "case"):
                        start = k
                    else:
                        continue  # binary arithmetic chain: skip
                else:
                    start = k
            neg = "NOT " if m.group(1) else ""
            kw = m.group(2).upper()
            operand = src[start:end]
            src = (
                src[:start]
                + f"({neg}(CAST({operand} AS BOOLEAN) <=> {kw}))"
                + src[m.end():]
            )
        return src

    if re.search(r"\bIS\s+(NOT\s+)?(TRUE|FALSE)\b", s, re.I):
        s = _is_bool_sub(s)
    # temporal literal IN (string list): MySQL compares temporally
    # (timestamp '2008-08-08 00:00:00' IN ('2008-08-08') is true);
    # Spark coerces the left side to STRING instead — cast the items
    def _temporal_in(m: re.Match) -> str:
        typ = ("DATE" if m.group(1).upper() == "DATE" else "TIMESTAMP")
        items = [x.strip() for x in m.group(4).split(",")]
        if not all(re.fullmatch(r"'[^']*'", x) for x in items):
            return m.group(0)
        lst = ", ".join(f"CAST({x} AS {typ})" for x in items)
        return f"{typ} {m.group(2)} {m.group(3) or ''}IN ({lst})"

    if re.search(r"(?i)\b(timestamp|datetime|date)\s*'", s):
        s = re.sub(
            r"(?i)\b(timestamp|datetime|date)\s*('[^']*')\s+(not\s+)?"
            r"in\s*\(([^()]*)\)",
            _temporal_in, s)
    # Doris 3-part names: `internal` is the built-in catalog — strip it
    # (Spark's session catalog is single-namespace). Anchored (round-8
    # ADVICE): in table-ref position (after FROM/JOIN/INTO/UPDATE/
    # TABLE) two trailing parts suffice; elsewhere (WHERE/SELECT column
    # refs like internal.db.tbl.col) require THREE trailing parts so a
    # table alias or column literally named `internal` (internal.s.f)
    # is left alone.
    s = re.sub(
        r"(?i)\b(from|join|into|update|table)(\s+)internal\."
        r"(?=`?\w+`?\.`?\w+`?)",
        r"\1\2", s)
    s = re.sub(r"(?i)\binternal\.(?=`?\w+`?\.`?\w+`?\.`?\w+`?)", "", s)
    # MySQL/Doris comma-join precedence: in `FROM a, b JOIN c ...` the
    # JOIN chain binds tighter than the comma — Spark parses it
    # left-deep instead (and resolves USING columns across the comma).
    # Parenthesize every comma-separated FROM item whose own top level
    # contains a JOIN (nereids_syntax_p0 using_join/join_order).
    def _comma_join_group(src: str) -> str:
        spans_cj = _lit_spans(src)

        def lit(i: int) -> bool:
            return any(a <= i < b for a, b in spans_cj)

        _CLAUSE = re.compile(
            r"(?i)\b(where|group|order|having|limit|union|intersect"
            r"|except|window|qualify)\b|;")
        out_parts, pos = [], 0
        for fm_ in re.finditer(r"(?i)\bfrom\b", src):
            if lit(fm_.start()) or fm_.start() < pos:
                continue
            seg_s = fm_.end()
            depth, j = 0, seg_s
            seg_e = len(src)
            while j < len(src):
                if not lit(j):
                    ch = src[j]
                    if ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                        if depth < 0:
                            seg_e = j
                            break
                    elif depth == 0:
                        cm_ = _CLAUSE.match(src, j)
                        if cm_:
                            seg_e = j
                            break
                j += 1
            seg = src[seg_s:seg_e]
            if "," not in seg or not re.search(r"(?i)\bjoin\b", seg):
                continue
            # top-level comma split of the segment
            items, depth2, buf, base = [], 0, [], seg_s
            for k2, ch in enumerate(seg):
                if lit(seg_s + k2):
                    buf.append(ch)
                    continue
                if ch == "(":
                    depth2 += 1
                elif ch == ")":
                    depth2 -= 1
                elif ch == "," and depth2 == 0:
                    items.append("".join(buf))
                    buf = []
                    continue
                buf.append(ch)
            items.append("".join(buf))
            if len(items) < 2:
                continue

            def _has_top_join(it: str) -> bool:
                d3 = 0
                for mj in re.finditer(r"[()]|(?i:\bjoin\b)", it):
                    t3 = mj.group(0)
                    if t3 == "(":
                        d3 += 1
                    elif t3 == ")":
                        d3 -= 1
                    elif d3 == 0:
                        return True
                return False

            new_items = []
            changed_cj = False
            for it in items:
                st = it.strip()
                if (_has_top_join(it)
                        and not re.search(r"(?i)\blateral\b", it)):
                    new_items.append(f" ({st}) ")
                    changed_cj = True
                else:
                    new_items.append(it)
            if changed_cj:
                return (src[:seg_s] + ",".join(new_items)
                        + _comma_join_group(src[seg_e:]))
        return src

    if re.search(r"(?i)\bfrom\b[^;]*,", s) and re.search(
            r"(?i)\bjoin\b", s):
        s = _comma_join_group(s)
    # Doris allows `lateral view ...` BEFORE the join list; Spark only
    # after it — wrap the base relation + lateral views in a subquery
    # aliased as the base table so qualified refs keep resolving
    s = re.sub(
        r"(?i)\bfrom\s+(`?\w+`?)"
        r"((?:\s+lateral\s+view\s+\w+\s*\([^()]*\)\s+\w+\s+as\s+"
        r"\w+(?:\s*,\s*\w+)*)+)\s+(?=(?:\w+\s+)??join\b)",
        lambda m: (f"from (select * from {m.group(1)}{m.group(2)}) "
                   f"{m.group(1).strip('`')} "),
        s)
    # parenthesized comma cross-join in FROM: `join (a, b) using(..)`
    s = re.sub(
        r"(?i)\bjoin\s*\(\s*(`?\w+`?)\s*,\s*(`?\w+`?)\s*\)",
        r"join (\1 CROSS JOIN \2)", s)
    # POSIX character classes -> Java \p{...} (regexp functions)
    if "[:" in s and re.search(r"(?i)regexp", s):
        _POSIX = {
            "alpha": "Alpha", "digit": "Digit", "lower": "Lower",
            "upper": "Upper", "alnum": "Alnum", "space": "Space",
            "punct": "Punct", "xdigit": "XDigit", "blank": "Blank",
            "cntrl": "Cntrl", "graph": "Graph", "print": "Print",
        }
        s = re.sub(
            r"\[:(\w+):\]",
            lambda m: ("\\\\p{" + _POSIX[m.group(1).lower()] + "}"
                       if m.group(1).lower() in _POSIX else m.group(0)),
            s)
    # `ORDER BY row_number() OVER (ORDER BY x)` sorts exactly like
    # `ORDER BY x` (rank of x is monotone in x); Doris permits the
    # window inside an aggregate's ORDER BY, Spark does not
    # (query_p0/aggregate agg_group_concat)
    s = re.sub(
        r"(?i)\border\s+by\s+row_number\s*\(\s*\)\s*over\s*\(\s*"
        r"order\s+by\s+([^()]+?)\s*\)",
        lambda m: "order by " + m.group(1), s)
    # constant scalar subquery as a plain expression (`order by
    # (select 1)`): fold to the literal — Spark bans subqueries inside
    # higher-order/aggregate sort lambdas. EXISTS/IN forms keep theirs.
    def _const_subq(m: re.Match) -> str:
        j = m.start() - 1
        while j >= 0 and s[j].isspace():
            j -= 1
        k0 = j
        while k0 >= 0 and (s[k0].isalnum() or s[k0] == "_"):
            k0 -= 1
        prev = s[k0 + 1 : j + 1].lower()
        if prev in ("exists", "in", "from", "join", "union", "all",
                    "except", "intersect"):
            return m.group(0)
        return "(" + m.group(1) + ")"

    if re.search(r"(?i)\(\s*select\s+(?:\d+|'[^']*')\s*\)", s):
        s = re.sub(
            r"(?i)\(\s*select\s+(\d+|'[^']*')\s*\)", _const_subq, s)
    # rank-family windows without ORDER BY: Doris permits them (row
    # order), Spark requires an order — a constant sort is the same
    # "arbitrary but stable within partition" contract
    s = re.sub(
        r"(?i)\b(row_number|rank|dense_rank|percent_rank|cume_dist|"
        r"ntile)(\s*\(\s*\d*\s*\)\s*over\s*\()"
        r"((?:[^()]|\((?:[^()]|\([^()]*\))*\))*)\)",
        lambda m: (
            m.group(0)
            if re.search(r"(?i)\border\s+by\b", m.group(3))
            else f"{m.group(1)}{m.group(2)}{m.group(3)} ORDER BY 1)"
        ),
        s)
    # Doris bracket join hints (`join [shuffle] t` / [broadcast] /
    # [bucket] / [colocate]): distribution hints — Catalyst/AQE pick the
    # physical strategy, so the hint drops
    s = re.sub(
        r"(?i)\bjoin\s*\[\s*(shuffle|broadcast|bucket|colocate)\s*\]",
        "join", s)
    # the hint can also trail the table ref/alias (`join t3 t3s
    # [broadcast] on ...`)
    s = re.sub(
        r"(?i)(\s)\[\s*(shuffle|broadcast|bucket|colocate)\s*\]"
        r"(\s+(?:on|join|where|inner|left|right|full|cross)\b)",
        r"\1\3", s)
    # Doris hidden delete-sign column (unique-model MoW): visible rows
    # always carry 0 — the engine's table models materialize deletes,
    # so every surviving row is visible
    s = re.sub(r"(?i)\b__DORIS_DELETE_SIGN__\b", "(0)", s)
    # date +/- DECIMAL literal used as a DATE (BETWEEN bounds etc.):
    # emit date_add/date_sub with an int day count — the function form
    # keeps DATE typing through the macro/typed passes, where `+`
    # would take Doris's packed-digit arithmetic and break the
    # surrounding date comparison
    s = re.sub(
        r"(?i)(CAST\s*\(\s*[^()]*\s+AS\s+DATE\s*\))\s*([+-])\s*"
        r"(\d+\.\d+)(?![\w.])",
        lambda m: ("date_add" if m.group(2) == "+" else "date_sub")
        + f"({m.group(1)}, CAST({m.group(3)} AS INT))",
        s)
    # Spark drops the sign of -0.0 literals in constant folding; Doris
    # (and IEEE atan2/copysign semantics) keep it — route through the
    # python strtod kernel, which the folder can't see through
    s = re.sub(
        r"(?i)\bCAST\s*\(\s*['\"]\s*(-\s*0(?:\.0+)?)\s*['\"]\s+AS\s+"
        r"(?:DOUBLE|FLOAT)\s*\)",
        lambda m: f"__str_to_double('{m.group(1)}')",
        s)
    # MySQL logical XOR (truthiness of each side, NULL-propagating)
    s = _sub_outside_literals(
        r"(?<![\w.])([\w.]+)\s+XOR\s+([\w.]+)(?![\w.])",
        r"(((\1) <> 0) <> ((\2) <> 0))",
        s,
        flags=re.I,
    )
    # CAST(x AS IPV4/IPV6): Doris parses+canonicalizes (trim, leading
    # zeros, RFC5952 compression, mapped/compat dotted tails, invalid ->
    # NULL) — route through the ip canon kernels; loop for nested
    # CAST(CAST(x AS IPV4) AS IPV6) chains (innermost consumed first)
    for _ in range(3):
        s2 = re.sub(
            r"CAST\s*\(((?:[^()']|'[^']*'|\((?:[^()']|'[^']*'|"
            r"\([^()]*\))*\))+?)\s+AS\s+IPV([46])\b\s*\)",
            lambda m: f"__ip{m.group(2)}_canon({m.group(1)})",
            s, flags=re.I,
        )
        if s2 == s:
            break
        s = s2
    s = re.sub(r"\bAS\s+IPV[46]\b", "AS STRING", s, flags=re.I)
    s = re.sub(r"<\s*IPV[46]\s*>", "<STRING>", s, flags=re.I)
    # Doris brace literals -> constructor calls (recursive, quote-aware):
    #   {'k': v, ...} map literal      -> map('k', v, ...)
    #   {v1, v2, ...} struct literal   -> struct(v1, v2, ...)
    # (fe-core StructLiteral/MapLiteral; regression suites insert structs
    # as positional brace lists, e.g. correctness_p0/test_struct_order_by).
    # A JSON text literal '{"a": 1}' is inside quotes and must stay text.
    def _split_brace_items(body: str) -> list[str] | None:
        items, cur, depth, in_str = [], [], 0, None
        for c in body:
            if in_str:
                cur.append(c)
                if c == in_str:
                    in_str = None
                continue
            if c in ("'", '"'):
                in_str = c
            elif c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
            elif c == "," and depth == 0:
                items.append("".join(cur).strip())
                cur = []
                continue
            cur.append(c)
        if in_str or depth != 0:
            return None
        items.append("".join(cur).strip())
        return items

    def _split_map_entry(item: str) -> tuple[str, str] | None:
        """Split `key : value` at the single top-level colon, or None."""
        depth, in_str = 0, None
        for i, c in enumerate(item):
            if in_str:
                if c == in_str:
                    in_str = None
            elif c in ("'", '"'):
                in_str = c
            elif c in "([{":
                depth += 1
            elif c in ")]}":
                depth -= 1
            elif c == ":" and depth == 0:
                return item[:i].strip(), item[i + 1 :].strip()
        return None

    def _convert_brace_literal(span: str) -> str:
        """span is `{...}` (balanced); convert or return unchanged."""
        body = span[1:-1].strip()
        if not body:
            return "map()"
        items = _split_brace_items(body)
        if items is None or any(not it for it in items):
            return span
        conv = [_convert_maps(it) for it in items]
        entries = [_split_map_entry(it) for it in conv]
        if all(e is not None for e in entries):
            # Doris allows NULL map keys ({null: v}); Spark's MapType
            # bans them at runtime. Shim: NUL-prefixed sentinel string
            # (sorts before every printable key, matching Doris's
            # null-key-first map ordering); the harness comparator
            # renders it back as the unquoted null key.
            kv = ", ".join(
                f"concat(char(0), 'null'), {v}"
                if k.upper() == "NULL"
                else f"{k}, {v}"
                for k, v in entries
            )
            return f"map({kv})"
        if all(e is None for e in entries):
            return f"struct({', '.join(conv)})"
        return span

    def _convert_maps(text: str) -> str:
        # find top-level {..} spans that are OUTSIDE string literals
        # (map literals contain quoted keys, so a plain quote-split fails)
        out, i, n, in_str = [], 0, len(text), None
        while i < n:
            c = text[i]
            if in_str:
                out.append(c)
                if c == in_str:
                    in_str = None
                i += 1
                continue
            if c in ("'", '"'):
                in_str = c
                out.append(c)
                i += 1
                continue
            if c == "{":
                depth, j, instr2 = 0, i, None
                while j < n:
                    cj = text[j]
                    if instr2:
                        if cj == instr2:
                            instr2 = None
                    elif cj in ("'", '"'):
                        instr2 = cj
                    elif cj == "{":
                        depth += 1
                    elif cj == "}":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                if j >= n:
                    out.append(text[i:])
                    break
                out.append(_convert_brace_literal(text[i : j + 1]))
                i = j + 1
                continue
            out.append(c)
            i += 1
        return "".join(out)

    s = _convert_maps(s)
    # NOTE: element_at(expr, bare_identifier) is deliberately NOT rewritten
    # to struct field access here — a map/array lookup with a column-valued
    # key (element_at(m, key_col)) is the common case and must stay native.
    # Struct element_at is resolved by the typed retry in tools/ref_parity.py
    # (only when Spark's analyzer proves the operand is a struct).
    # numeric element_at is out-of-range-safe in Doris; index 0 is NULL
    # (a hard error even for Spark's try_element_at — probe past the end)
    s = re.sub(
        r"\belement_at\s*\(\s*([^,()]+(?:\([^()]*\))?)\s*,\s*(-?\d+)\s*\)",
        lambda m: f"try_element_at({m.group(1)}, "
        + ("2147483647" if m.group(2) == "0" else m.group(2))
        + ")",
        s,
        flags=re.I,
    )
    # Doris CAST('<json>' AS ARRAY/MAP/STRUCT<...>) parses JSON text;
    # Spark's equivalent is from_json
    def _json_shape_ok(v, typ: str) -> bool:
        """Doris try_cast(json_text AS T) nulls on SHAPE mismatch where
        Spark's from_json would null elementwise — validate the parsed
        literal against the target type."""
        if v is None:
            return True
        t = re.sub(r"\s+", "", typ.lower())
        if t.startswith("array<") and t.endswith(">"):
            return isinstance(v, list) and all(
                _json_shape_ok(e, t[6:-1]) for e in v)
        if t.startswith("map<") and t.endswith(">"):
            vt = t[4:-1].split(",", 1)[-1]
            return isinstance(v, dict) and all(
                _json_shape_ok(e, vt) for e in v.values())
        if t.startswith("struct<"):
            return isinstance(v, dict)
        if t in ("boolean", "bool"):
            return isinstance(v, bool)
        if re.match(r"(tiny|small|big|large)?int(eger)?$", t):
            return isinstance(v, int) and not isinstance(v, bool)
        if t in ("float", "double") or t.startswith("decimal"):
            return isinstance(v, (int, float)) and not isinstance(v, bool)
        return not isinstance(v, (list, dict))

    def _pdc(text: str):
        """Parse Doris complex-literal TEXT (not JSON: unquoted map keys
        `{1:2}`, values-only structs `{1, "hello"}`). Returns
        ('list', items) | ('pairs', [(k,v)..]) | ('pos', items) |
        scalar (str/int/float/None). Raises ValueError."""
        i = 0
        n = len(text)

        def ws():
            nonlocal i
            while i < n and text[i] in " \t\n\r":
                i += 1

        def value():
            nonlocal i
            ws()
            if i >= n:
                raise ValueError("eof")
            c = text[i]
            if c == "[":
                i += 1
                items = []
                ws()
                if i < n and text[i] == "]":
                    i += 1
                    return ("list", items)
                while True:
                    items.append(value())
                    ws()
                    if i < n and text[i] == ",":
                        i += 1
                        continue
                    if i < n and text[i] == "]":
                        i += 1
                        return ("list", items)
                    raise ValueError("bad list")
            if c == "{":
                i += 1
                ws()
                if i < n and text[i] == "}":
                    i += 1
                    return ("pairs", [])
                first = value()
                ws()
                if i < n and text[i] == ":":
                    pairs = []
                    i += 1
                    pairs.append((first, value()))
                    ws()
                    while i < n and text[i] == ",":
                        i += 1
                        k = value()
                        ws()
                        if i >= n or text[i] != ":":
                            raise ValueError("bad map")
                        i += 1
                        pairs.append((k, value()))
                        ws()
                    if i < n and text[i] == "}":
                        i += 1
                        return ("pairs", pairs)
                    raise ValueError("bad map end")
                items = [first]
                while i < n and text[i] == ",":
                    i += 1
                    items.append(value())
                    ws()
                if i < n and text[i] == "}":
                    i += 1
                    return ("pos", items)
                raise ValueError("bad struct")
            if c in ("'", '"'):
                q = c
                i += 1
                buf = []
                while i < n:
                    ch = text[i]
                    if ch == "\\" and i + 1 < n:
                        buf.append(text[i + 1])
                        i += 2
                        continue
                    if ch == q:
                        i += 1
                        return "".join(buf)
                    buf.append(ch)
                    i += 1
                raise ValueError("unterminated string")
            j = i
            while j < n and text[j] not in ",:]}[{":
                j += 1
            tok = text[i:j].strip()
            i = j
            if not tok:
                raise ValueError("empty token")
            if tok.lower() == "null":
                return None
            try:
                return int(tok)
            except ValueError:
                pass
            try:
                return float(tok)
            except ValueError:
                pass
            return tok

        v = value()
        ws()
        if i != n:
            raise ValueError("trailing")
        return v

    def _split_type_args(t: str) -> list:
        out, depth, cur = [], 0, []
        for ch in t:
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
        return out

    def _lit_sql(v, typ: str) -> str:
        """SQL literal expression for parsed value v coerced to Doris
        type text typ. Raises ValueError when unrepresentable."""
        t = typ.strip()
        tl = re.sub(r"\s+", "", t.lower())
        if tl.startswith("array<") and tl.endswith(">"):
            inner = t[t.index("<") + 1: t.rindex(">")]
            if v is None:
                return f"CAST(NULL AS {t})"
            if not (isinstance(v, tuple) and v[0] == "list"):
                raise ValueError("not a list")
            if not v[1]:
                return f"CAST(array() AS {t})"
            return "array(" + ", ".join(
                _lit_sql(e, inner) for e in v[1]) + ")"
        if tl.startswith("map<") and tl.endswith(">"):
            kt, vt = _split_type_args(t[t.index("<") + 1: t.rindex(">")])
            if v is None:
                return f"CAST(NULL AS {t})"
            if not (isinstance(v, tuple) and v[0] == "pairs"):
                raise ValueError("not a map")
            if not v[1]:
                return (f"map_from_arrays(CAST(array() AS ARRAY<{kt}>), "
                        f"CAST(array() AS ARRAY<{vt}>))")
            return "map(" + ", ".join(
                f"{_lit_sql(k, kt)}, {_lit_sql(w, vt)}" for k, w in v[1]
            ) + ")"
        if tl.startswith("struct<") and tl.endswith(">"):
            fields = _split_type_args(t[t.index("<") + 1: t.rindex(">")])
            names, types = [], []
            for f in fields:
                nm, ft = f.split(":", 1)
                names.append(nm.strip().strip("`"))
                types.append(ft.strip())
            vals = [None] * len(names)
            if v is None:
                return f"CAST(NULL AS {t})"
            if isinstance(v, tuple) and v[0] == "pairs":
                got = {str(k).lower(): w for k, w in v[1]}
                vals = [got.get(nm.lower()) for nm in names]
            elif isinstance(v, tuple) and v[0] == "pos":
                for ix, e in enumerate(v[1][: len(names)]):
                    vals[ix] = e
            else:
                raise ValueError("not a struct")
            return "named_struct(" + ", ".join(
                f"'{nm}', {_lit_sql(w, ft)}"
                for nm, ft, w in zip(names, types, vals)) + ")"
        # scalars
        base = re.sub(r"[(<].*", "", tl)
        if v is None:
            st = {"varchar": "STRING", "char": "STRING", "text": "STRING",
                  "integer": "INT", "largeint": "DECIMAL(38,0)",
                  "datetimev2": "TIMESTAMP", "datetime": "TIMESTAMP",
                  "datev2": "DATE"}.get(base, t)
            return f"CAST(NULL AS {st})"
        if isinstance(v, tuple):
            raise ValueError("nested where scalar expected")
        if base in ("tinyint", "smallint", "int", "integer", "bigint",
                    "largeint"):
            iv = int(str(v).strip())  # raises on non-numeric
            return str(iv)
        if base in ("float", "double") or base.startswith("decimal"):
            fv = float(str(v).strip())
            lit = repr(fv)
            if base.startswith("decimal"):
                return f"CAST('{v}' AS {t})"
            return f"CAST({lit} AS {base.upper()})"
        if base in ("boolean", "bool"):
            sv = str(v).strip().lower()
            if sv in ("1", "t", "true", "yes", "on"):
                return "TRUE"
            if sv in ("0", "f", "false", "no", "off"):
                return "FALSE"
            raise ValueError("bad bool")
        if base in ("date", "datev2", "datetime", "datetimev2",
                    "timestamp"):
            st = "DATE" if base.startswith("date") and "time" not in \
                base else "TIMESTAMP"
            return f"CAST('{v}' AS {st})"
        # string-ish
        s_ = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s_}'"

    def _needs_py_complex(parsed, typ: str, json_ok: bool) -> bool:
        """True when Spark's from_json cannot express the cast: non-JSON
        Doris text, MAP with non-string keys, or string<->number element
        coercion."""
        if not json_ok:
            return True
        tl = re.sub(r"\s+", "", typ.lower())
        if re.search(r"map<(?!(?:string|varchar|char|text)\b)", tl):
            return True

        def walk(v, t):
            t = t.strip()
            ttl = re.sub(r"\s+", "", t.lower())
            if v is None:
                return False
            if ttl.startswith("array<"):
                inner = t[t.index("<") + 1: t.rindex(">")]
                return isinstance(v, tuple) and v[0] == "list" and any(
                    walk(e, inner) for e in v[1])
            if ttl.startswith("struct<"):
                if isinstance(v, tuple) and v[0] == "pos":
                    return True  # values-only struct text
                if isinstance(v, tuple) and v[0] == "pairs":
                    fields = _split_type_args(
                        t[t.index("<") + 1: t.rindex(">")])
                    fmap = {}
                    for f in fields:
                        nm, ft = f.split(":", 1)
                        fmap[nm.strip().strip("`").lower()] = ft
                    return any(
                        walk(w, fmap.get(str(k).lower(), "string"))
                        for k, w in v[1])
                return False
            base = re.sub(r"[(<].*", "", ttl)
            if base in ("tinyint", "smallint", "int", "integer",
                        "bigint", "largeint", "float", "double") or \
                    base.startswith("decimal"):
                return isinstance(v, str)  # "123" -> 123 coercion
            return False

        return walk(parsed, typ)

    def _cast_complex(text: str) -> str:
        out, i, n = [], 0, len(text)
        pat = re.compile(r"(TRY_)?CAST\s*\(", re.I)
        while i < n:
            m = pat.search(text, i)
            if m is None:
                out.append(text[i:])
                break
            # find the matching close paren of this CAST
            j, depth, in_str = m.end() - 1, 0, None
            while j < n:
                c = text[j]
                if in_str:
                    if c == in_str:
                        in_str = None
                elif c in ("'", '"'):
                    in_str = c
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            body = text[m.end() : j]
            is_try = bool(m.group(1))
            am = re.search(
                r"\s+AS\s+((?:ARRAY|MAP|STRUCT)\s*<.*>|JSONB?)\s*$",
                body, re.I | re.S
            )
            if am and am.group(1).upper().startswith("JSON") and not is_try:
                am = None  # plain CAST(x AS JSON) is handled elsewhere
            # JSON-text parse only applies to string-valued sources: a
            # quoted literal, or a bare column that the native CAST path
            # can't be (complex-to-complex casts stay native CAST — the
            # fallback retry in tools/ref_parity handles string columns)
            src_expr = body[: am.start()].strip() if am else ""
            if am and re.fullmatch(r"'(?:[^']|'')*'|\"[^\"]*\"", src_expr):
                typ = " ".join(am.group(1).split())
                # Doris JSONB normalizes on parse: duplicate object keys
                # keep the LAST value (json.loads does the same); also
                # drops insignificant whitespace
                parsed, parse_ok = None, False
                try:
                    import json as _json

                    raw = src_expr[1:-1]
                    if src_expr[0] == "'":
                        raw = raw.replace("''", "'")
                    parsed = _json.loads(raw)
                    parse_ok = True
                    normalized = _json.dumps(
                        parsed, separators=(",", ":")
                    )
                    src_expr = "'" + normalized.replace("'", "''") + "'"
                except (ValueError, TypeError):
                    pass
                out.append(text[i : m.start()])
                py_lit = None
                if not typ.upper().startswith("JSON"):
                    # Doris complex-literal forms from_json can't do:
                    # unquoted map keys, values-only structs, quoted
                    # numbers — evaluate to a typed SQL literal
                    try:
                        pv = _pdc(raw)
                        if _needs_py_complex(pv, typ, parse_ok):
                            py_lit = _lit_sql(pv, typ)
                    except ValueError:
                        pass
                if typ.upper().startswith("JSON"):
                    # try_cast(literal AS JSON): normalized text or NULL
                    out.append(
                        src_expr if parse_ok
                        else "CAST(NULL AS STRING)")
                elif py_lit is not None:
                    out.append(py_lit)
                elif is_try and not (
                    parse_ok and _json_shape_ok(parsed, typ)
                ):
                    out.append(f"CAST(NULL AS {typ})")
                else:
                    out.append(f"from_json({src_expr}, '{typ}')")
            elif (
                am
                and re.match(r"(?i)map\s*[(<]", am.group(1).strip())
                and re.match(r"(?i)map\s*\(", src_expr)
            ):
                # Spark cannot cast MAP->MAP with different key/value
                # types — rebuild via key/value arrays (stays codegen)
                typ = " ".join(am.group(1).split())
                kt, vt = _split_type_args(
                    typ[typ.index("<") + 1: typ.rindex(">")])
                out.append(text[i : m.start()])
                out.append(
                    f"map_from_arrays("
                    f"CAST(map_keys({src_expr}) AS ARRAY<{kt}>), "
                    f"CAST(map_values({src_expr}) AS ARRAY<{vt}>))")
            else:
                out.append(text[i : m.start()])
                out.append(text[m.start() : j + 1])
            i = j + 1
        return "".join(out)

    # Doris type spellings INSIDE complex type parameters
    # (cast(x as array<datetimev2>)) — scalar casts are rewritten above,
    # but the interior names must map before the native CAST sees them
    def _inner_types(m: re.Match) -> str:
        t = m.group(0)
        # trailing \b so FIELD NAMES like datetime_col / char_col are
        # never mistaken for type spellings (pinned by struct-md.groovy)
        t = re.sub(r"(?i)\bdatetimev?[12]?\b\s*(\(\s*\d+\s*\))?", "TIMESTAMP", t)
        t = re.sub(r"(?i)\bdatev[12]\b", "DATE", t)
        t = re.sub(r"(?i)\blargeint\b", "DECIMAL(38,0)", t)
        t = re.sub(r"(?i)\b(?:text|json[b]?|varchar|char)\b\s*(\(\s*\d+\s*\))?",
                   "STRING", t)
        t = re.sub(r"(?i)\bdecimalv[23]\b", "DECIMAL", t)
        return t

    s = re.sub(
        r"(?i)\b(?:ARRAY|MAP|STRUCT)<[^<>]*(?:<[^<>]*(?:<[^<>]*>[^<>]*)*>[^<>]*)*>",
        _inner_types,
        s,
    )
    s = _cast_complex(s)

    # Doris array subscripts are 1-based and out-of-range-safe; rewrite
    # integer-literal subscripts to try_element_at (chains walk back over
    # balanced parens/brackets)
    def _literal_spans(text: str) -> list[tuple[int, int]]:
        """[start, end) spans of '...'/"..." string literals."""
        spans, i, n = [], 0, len(text)
        while i < n:
            c = text[i]
            if c in ("'", '"'):
                j = i + 1
                while j < n and text[j] != c:
                    j += 1
                spans.append((i, j + 1))
                i = j + 1
            else:
                i += 1
        return spans

    def _subscripts(text: str) -> str:
        sub = re.compile(r"\[\s*(-?\d+)\s*\]")
        changed = True
        while changed:
            changed = False
            spans = _literal_spans(text)
            for m in sub.finditer(text):
                # quoted text of the form ident[N] (JSON paths, LIKE
                # patterns) must never be rewritten (spans recomputed
                # after each mutation)
                if any(a <= m.start() < b for a, b in spans):
                    continue
                k = m.start() - 1
                if k < 0:
                    continue
                # walk back over the base expression
                end = m.start()
                j = k
                while j >= 0:
                    c = text[j]
                    if c in ")]":
                        depth = 0
                        while j >= 0:
                            if text[j] in ")]":
                                depth += 1
                            elif text[j] in "([":
                                depth -= 1
                                if depth == 0:
                                    break
                            j -= 1
                        j -= 1
                    elif c.isalnum() or c in "_.`":
                        j -= 1
                    else:
                        break
                start = j + 1
                base = text[start:end].strip()
                if not base or not re.search(r"[A-Za-z_)\]]", base):
                    continue
                text = (
                    text[:start]
                    # index 0 is an ERROR even for try_element_at; Doris
                    # yields NULL — probe past the end instead
                    + (
                        f"try_element_at({base}, 2147483647)"
                        if m.group(1) == "0"
                        else f"try_element_at({base}, {m.group(1)})"
                    )
                    + text[m.end() :]
                )
                changed = True
                break
        return text

    s = _subscripts(s)

    # Doris array slice syntax arr[l:r] / arr[l:] (r is a LENGTH, not an
    # end index: [1,2,3][1:1] -> [1]): off 0, negative length, or an
    # offset before the first element all yield the EMPTY array (docs
    # array-functions/array_slice; goldens in query_p0 array suites).
    def _slices(text: str) -> str:
        sub = re.compile(r"\[\s*(-?\d+)\s*:\s*(-?\d+)?\s*\]")
        changed = True
        while changed:
            changed = False
            spans = _literal_spans(text)
            for m in sub.finditer(text):
                if any(a <= m.start() < b for a, b in spans):
                    continue
                k = m.start() - 1
                if k < 0:
                    continue
                end = m.start()
                j = k
                while j >= 0:
                    c = text[j]
                    if c in ")]":
                        depth = 0
                        while j >= 0:
                            if text[j] in ")]":
                                depth += 1
                            elif text[j] in "([":
                                depth -= 1
                                if depth == 0:
                                    break
                            j -= 1
                        j -= 1
                    elif c.isalnum() or c in "_.`":
                        j -= 1
                    else:
                        break
                start = j + 1
                base = text[start:end].strip()
                if not base or not re.search(r"[A-Za-z_)\]]", base):
                    continue
                off = int(m.group(1))
                ln = m.group(2)
                if off == 0 or (ln is not None and int(ln) < 0):
                    repl = f"slice({base}, 1, 0)"
                else:
                    length = ln if ln is not None else f"size({base})"
                    repl = (
                        f"(CASE WHEN {off} < -size({base}) "
                        f"THEN slice({base}, 1, 0) "
                        f"ELSE slice({base}, {off}, {length}) END)"
                    )
                text = text[:start] + repl + text[m.end():]
                changed = True
                break
        return text

    if ":" in s:
        s = _slices(s)
    s = re.sub(r"\bAS\s+UNSIGNED\b", "AS BIGINT", s, flags=re.I)
    s = re.sub(r"\bINTERVAL\s+(-?\d+)\s+QUARTER\b", lambda m: f"INTERVAL {int(m.group(1)) * 3} MONTH", s, flags=re.I)
    # date_floor/date_ceil(x, INTERVAL n unit) -> the registered
    # {unit}_floor/{unit}_ceil period form (NULL period -> NULL result,
    # carried through the UDF's INT parameter)
    s = re.sub(
        r"\bdate_(floor|ceil)\s*\(\s*(.*?),\s*INTERVAL\s+(\d+|NULL)\s+(\w+)\s*\)",
        lambda m: f"{m.group(4).lower()}_{m.group(1)}({m.group(2)}, {m.group(3)})",
        s,
        flags=re.I | re.S,
    )
    # Doris EXTRACT(WEEK ...) follows MySQL WEEK() mode 0, not ISO
    s = re.sub(
        r"\bextract\s*\(\s*week\s+from\s+(.*?)\)",
        lambda m: f"week(CAST({m.group(1)} AS TIMESTAMP), 0)",
        s,
        flags=re.I | re.S,
    )
    # unix_timestamp: MySQL %-format -> parse via str_to_date; plain form
    # clamps to 0 outside the MySQL epoch range (pre-1970 -> 0)
    def _uts(expr: str) -> str:
        # MySQL clamps pre-epoch to 0 but keeps NULL for unparseable input
        return (
            f"CASE WHEN unix_timestamp({expr}) IS NULL THEN NULL "
            f"ELSE greatest(0, unix_timestamp({expr})) END"
        )

    # balanced scan (the first argument may nest parens arbitrarily deep,
    # e.g. after the VARCHAR-cast render rewrite above)
    def _uts_two_arg(text: str) -> str:
        pat = re.compile(r"\bunix_timestamp\s*\(", re.I)
        pos = 0
        while True:
            m = pat.search(text, pos)
            if m is None:
                return text
            depth, k, in_q, n = 1, m.end(), None, len(text)
            commas = []
            while k < n and depth:
                c = text[k]
                if in_q:
                    if c == in_q:
                        in_q = None
                elif c in ("'", '"'):
                    in_q = c
                elif c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                elif c == "," and depth == 1:
                    commas.append(k)
                k += 1
            if depth or len(commas) != 1:
                pos = m.end()
                continue
            a1 = text[m.end() : commas[0]].strip()
            a2 = text[commas[0] + 1 : k - 1].strip()
            fm = re.match(r"^['\"]([^'\"]*%[^'\"]*)['\"]$", a2)
            if fm is None:
                pos = k
                continue
            repl = _uts(f"str_to_date({a1}, '{fm.group(1)}')")
            text = text[: m.start()] + repl + text[k:]
            pos = m.start() + len(repl)

    s = _uts_two_arg(s)
    s = re.sub(
        r"\bunix_timestamp\s*\(\s*('[^']*')\s*\)",
        lambda m: _uts(f"try_cast({m.group(1)} AS TIMESTAMP)"),
        s,
        flags=re.I,
    )
    # date_add(x, INTERVAL n unit) -> x + INTERVAL n unit; sub-day units
    # force a timestamp operand (Spark rejects DATE + hour intervals)
    def _interval_arith(sign: str):
        def repl(m):
            expr, n, unit = m.group(1), m.group(2), m.group(3)
            cu = _COMPOSITE_UNITS.get(unit.upper())
            mk = None
            if not re.match(r"^\s*[+-]?\d+\s*$", n) and not re.match(
                r"^\s*'", n
            ) and n.strip().upper() != "NULL":
                # non-literal count (interval kint+1 day): Spark's
                # INTERVAL literal refuses expressions — make_*_interval
                mk = make_interval_expr(n, unit)
            if cu is not None or (
                unit.lower() in _DATE_UNITS_MICROS and unit.lower() != "day"
            ) or re.match(r"^\s*'", expr) or expr.strip().upper() == "NULL" \
                    or re.match(r"^\s*concat\w*\s*\(", expr, re.I) \
                    or mk is not None:
                # a bare NULL operand must type as TIMESTAMP: NULL +
                # INTERVAL yields an interval-typed column otherwise
                # Doris coerces string datetime literals; Spark needs the
                # cast (also required for sub-day/composite units on DATE).
                expr = f"CAST({expr} AS TIMESTAMP)"
            if mk is not None:
                return f"({expr} {sign} {mk})"
            return f"({expr} {sign} INTERVAL {n} {cu or unit})"

        return repl

    _da_pat = (
        r"\b(?:date_%s|%sdate|days_%s)\s*\(\s*((?:[^(),']|'[^']*'"
        r"|\((?:[^()']|'[^']*')*\))+?),\s*"
        r"INTERVAL\s+([^,()]+?)\s+(\w+)\s*\)"
    )
    s = re.sub(
        _da_pat % ("add", "add", "add"), _interval_arith("+"), s,
        flags=re.I | re.S,
    )
    s = re.sub(
        _da_pat % ("sub", "sub", "sub"), _interval_arith("-"), s,
        flags=re.I | re.S,
    )
    # bare arithmetic with a non-literal count: x + INTERVAL kint DAY
    def _bare_ivl(m):
        sign, n, unit = m.group(1), m.group(2), m.group(3)
        if re.match(r"^\s*[+-]?\d+\s*$", n) or re.match(r"^\s*'", n):
            return m.group(0)
        mk = make_interval_expr(n, unit)
        return f"{sign} {mk}" if mk is not None else m.group(0)

    s = _sub_outside_literals(
        r"([+-])\s*INTERVAL\s+([^,()']+?)\s+"
        r"(day|week|hour|minute|second|month|quarter|year)s?\b",
        _bare_ivl,
        s,
        flags=re.I,
    )
    # Bare interval arithmetic with composite units:  x + INTERVAL '1 1:1:1' DAY_SECOND
    s = re.sub(
        r"\bINTERVAL\s+('[^']*'|-?\w+)\s+(%s)\b" % "|".join(_COMPOSITE_UNITS),
        lambda m: f"INTERVAL {m.group(1)} {_COMPOSITE_UNITS[m.group(2).upper()]}",
        s,
        flags=re.I,
    )
    # Doris date_trunc(datetime, unit) -> Spark date_trunc(unit, datetime)
    # (swap only when the SECOND argument is the unit keyword).
    _UNITS = ("year", "quarter", "month", "week", "day", "hour", "minute", "second")
    s = re.sub(
        r"\bdate_trunc\s*\(\s*(.+?)\s*,\s*'(%s)'\s*\)" % "|".join(_UNITS),
        lambda m: f"date_trunc('{m.group(2)}', {m.group(1)})",
        s,
        flags=re.I | re.S,
    )
    # MySQL %-format strings in date_format/from_unixtime route to the
    # engine's __mysql_strftime kernel (exact token surface incl. %D/%l/
    # %V; Doris additionally skips leading format whitespace -> ltrim).
    # Java-pattern literals — no '%' — pass through untouched, as the
    # reference also accepts them. time_format is not rewritten: it
    # already IS the kernel.
    # first-arg fragment: top-level commas/semicolons/parens excluded,
    # quoted strings and two levels of nested calls allowed — keeps the
    # match from swallowing text past the call's own closing paren
    # (a CASE branch ending in `))` followed later by another quoted
    # literal used to fuse two calls into one bad match)
    _FMT_ARG = (
        r"((?:[^();',]|'[^']*'|\((?:[^()']|'[^']*'"
        r"|\((?:[^()']|'[^']*'|\([^()]*\))*\))*\))*?)"
    )
    s = re.sub(
        r"\bdate_format\s*\(" + _FMT_ARG + r",\s*'([^']*%[^']*)'\s*\)",
        lambda m: (
            # the CAST .. AS STRING crosses the Arrow boundary as text:
            # timestamp[ns] tops out at 2262, Doris datetimes reach 9999
            "ltrim(__mysql_strftime(CAST("
            f"CASE WHEN typeof({m.group(1)}) IN "
            "('tinyint', 'smallint', 'int', 'bigint') "
            # inline the packed-digit reader (a SQL UDF here would be
            # rejected inside Sort/Generate operators)
            f"THEN {_dt_from_numeric_inline(m.group(1))} "
            f"ELSE CAST(({m.group(1)}) AS TIMESTAMP) END "
            f"AS STRING), '{m.group(2)}'))"
        ),
        s,
        flags=re.I | re.S,
    )
    s = re.sub(
        r"\bfrom_unixtime\s*\(" + _FMT_ARG + r",\s*'([^']*%[^']*)'\s*\)",
        lambda m: f"__mysql_strftime(CAST(timestamp_seconds({m.group(1)}) AS STRING), '{m.group(2)}')",
        s,
        flags=re.I | re.S,
    )
    # %-less format that is not a recognizable Java pattern: MySQL renders
    # its characters literally -> the kernel does too
    s = re.sub(
        r"\bfrom_unixtime\s*\(" + _FMT_ARG + r",\s*'([^'%]*)'\s*\)",
        lambda m: (
            f"__mysql_strftime(CAST(timestamp_seconds({m.group(1)}) AS STRING), '{m.group(2)}')"
            if not re.fullmatch(r"[yMdHhmsSaET\-/:., ]*", m.group(2))
            else m.group(0)
        ),
        s,
        flags=re.I | re.S,
    )
    # 1-arg from_unixtime: Doris returns the rendered datetime WITH any
    # fractional seconds the (double/decimal) input carries; Spark's
    # builtin formats whole seconds only. CAST(timestamp AS STRING)
    # renders '... HH:mm:ss[.fff]' exactly like the reference.
    s = re.sub(
        r"\bfrom_unixtime\s*\(([^(),]*(?:\([^()]*\)[^(),]*)*)\)",
        lambda m: f"CAST(timestamp_seconds({m.group(1)}) AS STRING)",
        s,
        flags=re.I,
    )
    # Doris numbers("number"="N") TVF -> range(N) with the Doris column
    # name (extra kv properties like backend_num are execution hints)
    s = re.sub(
        r"\bnumbers\s*\(\s*[\"']number[\"']\s*=\s*[\"'](\d+)[\"'][^)]*\)",
        lambda m: f"(SELECT id AS number FROM range({m.group(1)}))",
        s,
        flags=re.I,
    )
    # Doris's stddev/variance WINDOW functions return 0.0 over a
    # single-value frame (Spark's _samp forms yield NULL) but keep NULL
    # for an empty / all-NULL frame — guard with a count over the same
    # frame, then coalesce
    s = re.sub(
        r"\b(stddev|stddev_pop|stddev_samp|std|variance|var_pop|var_samp|"
        r"variance_pop|variance_samp)\s*\(([^()]*)\)\s+over\s*\(([^()]*)\)",
        r"IF(count(\2) OVER (\3) = 0, NULL, "
        r"coalesce(\1(\2) OVER (\3), 0e0))",
        s,
        flags=re.I,
    )
    # windowed percentile_approx: the reference's TDigest at suite-size
    # compression interpolates like the exact percentile — use it (the
    # compression argument drops; aggregate percentile_approx unchanged)
    s = re.sub(
        r"\bpercentile_approx\s*\(\s*([^(),]+)\s*,\s*([^(),]+?)\s*"
        r"(?:,\s*[^(),]+)?\)(\s+over\s*\()",
        r"percentile(\1, \2)\3",
        s,
        flags=re.I,
    )
    # MySQL zero-arg COUNT() == COUNT(*)
    s = re.sub(r"\bcount\s*\(\s*\)", "count(*)", s, flags=re.I)
    # Spark's EXTRACT has no MICROSECOND field; Doris does.
    s = re.sub(
        r"\bextract\s*\(\s*microsecond\s+from\s+(.*?)\)",
        lambda m: f"microsecond({m.group(1)})",
        s,
        flags=re.I | re.S,
    )
    s = _bracket_arrays(s)
    s = _three_valued_in(s)
    return s


def _in_subquery_spans(s: str) -> list[tuple[int, int]]:
    """[start, end) spans where an IN-subquery needs the three-valued
    expansion: SELECT-list spans (projection) and JOIN ON conditions.
    WHERE/HAVING are excluded — there NULL filters like FALSE and Spark's
    null-aware anti join already implements the semantics efficiently."""
    spans: list[tuple[int, int]] = []
    stack: list[tuple[int, int]] = []  # (depth, select-pos)
    on_start: tuple[int, int] | None = None
    kw = re.compile(
        r"(SELECT|FROM|ON|WHERE|GROUP|HAVING|ORDER|LIMIT|UNION|JOIN"
        r"|INNER|LEFT|RIGHT|FULL|CROSS|USING)\b",
        re.I,
    )
    depth, in_q, i, n = 0, None, 0, len(s)
    while i < n:
        c = s[i]
        if in_q:
            if c == in_q:
                in_q = None
        elif c in ("'", '"'):
            in_q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if on_start is not None and depth < on_start[0]:
                spans.append((on_start[1], i))
                on_start = None
            while stack and depth < stack[-1][0]:
                stack.pop()
        elif c.isalpha() and (
            i == 0 or not (s[i - 1].isalnum() or s[i - 1] in "_`$.")
        ):
            m = kw.match(s, i)
            if m:
                word = m.group(1).upper()
                if on_start is not None and depth == on_start[0] and word != "SELECT":
                    spans.append((on_start[1], i))
                    on_start = None
                if word == "SELECT":
                    stack.append((depth, m.end()))
                elif word == "FROM":
                    if stack and stack[-1][0] == depth:
                        spans.append((stack.pop()[1], i))
                elif word == "ON":
                    on_start = (depth, m.end())
                i = m.end()
                continue
        i += 1
    if on_start is not None:
        spans.append((on_start[1], n))
    return spans


def _three_valued_in(s: str) -> str:
    """`X [NOT] IN (SELECT e FROM body)` in a PROJECTION or JOIN-ON
    position -> explicit three-valued CASE. Spark plans these positions
    as a two-valued ExistenceJoin (exists flag), so a NULL probe or a
    NULL in the subquery result yields FALSE where the standard (and
    Doris's mark join, be/src/pipeline/exec/hashjoin_probe_operator.cpp
    mark-join flag) yield NULL. The expansion keeps correlation intact:
      CASE WHEN X IN (sub) THEN TRUE                -- real match
           WHEN EXISTS (sub AND e IS NULL) THEN NULL -- null in set
           WHEN X IS NULL AND EXISTS (sub) THEN NULL -- null probe
           ELSE FALSE END   (TRUE/FALSE swapped for NOT IN)"""
    if not re.search(r"\bIN\s*\(\s*SELECT\b", s, re.I):
        return s
    pat = re.compile(r"(\bNOT\s+)?\bIN\s*\(\s*(?=SELECT\b)", re.I)
    spans = _in_subquery_spans(s)
    matches = [
        m
        for m in pat.finditer(s)
        if any(a <= m.start() < b for a, b in spans)
    ]
    # right-to-left: earlier offsets stay valid, and the `X IN (sub)`
    # kept inside each CASE expansion is never rescanned
    for m in reversed(matches):
        if True:
            # matching close paren of the subquery
            po = s.index("(", m.start())
            d2, k, q2 = 0, po, None
            while k < len(s):
                ch = s[k]
                if q2:
                    if ch == q2:
                        q2 = None
                elif ch in ("'", '"'):
                    q2 = ch
                elif ch == "(":
                    d2 += 1
                elif ch == ")":
                    d2 -= 1
                    if d2 == 0:
                        break
                k += 1
            sub = s[po + 1 : k]
            # walk back over the probe expression X
            j = m.start() - 1
            while j >= 0 and s[j].isspace():
                j -= 1
            end_x = j + 1
            while j >= 0:
                ch = s[j]
                if ch in ")]":
                    dd = 0
                    while j >= 0:
                        if s[j] in ")]":
                            dd += 1
                        elif s[j] in "([":
                            dd -= 1
                            if dd == 0:
                                break
                        j -= 1
                    j -= 1
                elif ch.isalnum() or ch in "_.`'":
                    if ch == "'":
                        j -= 1
                        while j >= 0 and s[j] != "'":
                            j -= 1
                        j -= 1
                    else:
                        j -= 1
                else:
                    break
            start_x = j + 1
            x = s[start_x:end_x].strip()
            parts = _split_in_subquery(sub)
            if not x or parts is None:
                continue
            e, rest, where_pos = parts
            base = f"SELECT 1 FROM {rest}"
            if where_pos is not None:
                # parenthesize the original predicate so a top-level OR
                # ('WHERE a=1 OR b=2') doesn't bind the appended AND to
                # its last disjunct only
                frm_part = rest[:where_pos].rstrip()
                pred = rest[where_pos + 5 :].strip()
                aug = (
                    f"SELECT 1 FROM {frm_part} WHERE ({pred}) "
                    f"AND (({e}) IS NULL)"
                )
            else:
                aug = f"{base} WHERE ({e}) IS NULL"
            neg = bool(m.group(1))
            t, f_ = ("FALSE", "TRUE") if neg else ("TRUE", "FALSE")
            repl = (
                f"(CASE WHEN {x} IN ({sub}) THEN {t} "
                f"WHEN EXISTS ({aug}) THEN NULL "
                f"WHEN ({x}) IS NULL AND EXISTS ({base}) THEN NULL "
                f"ELSE {f_} END)"
            )
            s = s[:start_x] + repl + s[k + 1 :]
    return s


def _split_in_subquery(sub: str) -> tuple[str, str, int | None] | None:
    """Split `SELECT e FROM rest` -> (e, rest, index-of-top-WHERE-in-rest
    or None); None when the sub's shape would break the WHERE
    augmentation (GROUP BY / ORDER BY / LIMIT / UNION / multi-item
    select list)."""
    sm = re.match(r"\s*SELECT\s+(?:DISTINCT\s+)?", sub, re.I)
    if sm is None:
        return None
    depth, in_q, i, n = 0, None, sm.end(), len(sub)
    frm = None
    while i < n:
        c = sub[i]
        if in_q:
            if c == in_q:
                in_q = None
        elif c in ("'", '"'):
            in_q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            if c == ",":
                return None
            if (
                c in "fF"
                and sub[i : i + 4].upper() == "FROM"
                and not (sub[i - 1].isalnum() or sub[i - 1] in "_`")
                and not (
                    i + 4 < n and (sub[i + 4].isalnum() or sub[i + 4] in "_`")
                )
            ):
                frm = i
                break
        i += 1
    if frm is None:
        return None
    e = sub[sm.end() : frm].strip()
    rest = sub[frm + 4 :].strip()
    for w in ("GROUP", "ORDER", "LIMIT", "UNION", "INTERSECT", "EXCEPT"):
        if _scan_depth0_word(rest, w) is not None:
            return None
    return e, rest, _scan_depth0_word(rest, "WHERE")


def _scan_depth0_word(text: str, word: str) -> int | None:
    depth, in_q, i, n, wl = 0, None, 0, len(text), len(word)
    while i < n:
        c = text[i]
        if in_q:
            if c == in_q:
                in_q = None
        elif c in ("'", '"'):
            in_q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (
            depth == 0
            and text[i : i + wl].upper() == word
            and (i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "_`"))
            and not (
                i + wl < n
                and (text[i + wl].isalnum() or text[i + wl] in "_`")
            )
        ):
            return i
        i += 1
    return None
