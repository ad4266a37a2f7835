"""Doris avg(DECIMAL) result typing — scale max(s, 4), truncated.

Reference: Avg.java computePrecision returns DECIMAL128(38, max(scale,
DEFAULT_MIN_AVG_DECIMAL128_SCALE=4)) (fe/fe-core/.../functions/agg/
Avg.java:88-108, fe/fe-type/.../ScalarType.java:82), and the BE's
int128 sum/count division TRUNCATES toward zero. Spark's avg(decimal
(p,s)) instead yields decimal(p+4, s+4) with HALF_UP rounding, so for
inputs with s < 4 the rendered values visibly differ (25.537587 vs
Doris 25.5375 — pinned by nereids_tpch_p0 q1).

This is a TYPED rewrite, which a text-only dialect layer cannot decide:
whether avg's input is decimal (and its scale) is only known after
analysis. Engine.sql therefore runs a two-pass scheme:

1. analyze the statement once (the DataFrame Spark already built),
2. walk the ANALYZED plan for Average nodes over DecimalType children
   with scale < 4, keyed by the child expression's normalized SQL,
3. rewrite each matching textual `avg(ARG)` call site into exact
   integer arithmetic::

       CAST((U - U % n) / n / 10000 AS DECIMAL(38,4))
       with U = CAST(CAST(sum(ARG) AS DECIMAL(38,s)) * 10^(4-s)
                     AS DECIMAL(38,0)),
            n = CAST(count(ARG) AS DECIMAL(20,0))

   (U - U % n) is exactly divisible by n, so the decimal division is
   exact (no scale-6 half-up drift), and the truncation toward zero
   matches the BE's int128 division. count(ARG)=0 yields NULL, same as
   avg over the empty group.

Sites under a window OVER(...) and sites whose argument can't be
matched to a plan node are left untouched (conservative: Spark
semantics). The whole pass is skipped when the statement contains no
`avg(` token, so ordinary queries pay nothing.
"""

from __future__ import annotations

import re

from doris_spark.plans.dialect import _lit_spans

_AVG_TOKEN = re.compile(r"(?<![\w.$])avg\s*\(", re.I)


def _norm_arg(s: str) -> str:
    """Normalization shared by the textual call-site argument and the
    analyzed plan's child.sql(): case/whitespace/backtick-folded, parens
    dropped, identifier qualifiers (alias., db.table.) stripped."""
    s = s.strip().lower().replace("`", "")
    # iterate to a fixpoint: catalog.db.table.col sheds one qualifier
    # per pass (the lookbehind blocks mid-chain matches)
    while True:
        s2 = re.sub(r"(?<![\d.])\b[a-z_][\w$]*\.(?=[a-z_])", "", s)
        if s2 == s:
            break
        s = s2
    s = re.sub(r"\s+", "", s)
    return s.replace("(", "").replace(")", "")


def _call_sites(stmt: str):
    """Yield (start, end, arg, distinct, windowed) for every textual
    avg(...) call outside string literals."""
    lits = _lit_spans(stmt)

    def in_lit(i: int) -> bool:
        return any(a <= i < b for a, b in lits)

    for m in _AVG_TOKEN.finditer(stmt):
        if in_lit(m.start()):
            continue
        depth, j = 0, m.end() - 1
        while j < len(stmt):
            if in_lit(j):
                j += 1
                continue
            if stmt[j] == "(":
                depth += 1
            elif stmt[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= len(stmt):
            return
        arg = stmt[m.end() : j]
        dm = re.match(r"\s*DISTINCT\b", arg, re.I)
        distinct = dm is not None
        if distinct:
            arg = arg[dm.end() :]
        windowed = re.match(r"\s*over\b", stmt[j + 1 :], re.I) is not None
        yield m.start(), j + 1, arg.strip(), distinct, windowed


def _collect_scales(jdf) -> dict[str, int]:
    """Walk the analyzed plan (plans, their expressions, and subquery
    plans inside expressions) collecting Average-over-DecimalType child
    scales, keyed by normalized child SQL. Conflicting duplicates are
    dropped (conservative skip)."""
    out: dict[str, int] = {}
    dead: set[str] = set()
    stack = [jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        try:
            exprs = node.expressions()
        except Exception:
            continue
        estack = [exprs.apply(i) for i in range(exprs.length())]
        while estack:
            e = estack.pop()
            cls = e.getClass().getName()
            if cls.endswith(".aggregate.Average"):
                child = e.children().apply(0)
                dt = child.dataType()
                if dt.getClass().getSimpleName() == "DecimalType":
                    key = _norm_arg(child.sql())
                    s = dt.scale()
                    if key in out and out[key] != s:
                        dead.add(key)
                    out[key] = s
            if cls.endswith("ScalarSubquery") or cls.endswith(
                "ListQuery"
            ) or cls.endswith("Exists") or cls.endswith("LateralSubquery"):
                try:
                    stack.append(e.plan())
                except Exception:
                    pass
            ec = e.children()
            for i in range(ec.length()):
                estack.append(ec.apply(i))
    for k in dead:
        out.pop(k, None)
    return out


def _formula(arg: str, distinct: bool, s: int) -> str:
    d = "DISTINCT " if distinct else ""
    # sum * 10^4 is integral for s <= 4, so the DECIMAL(38,0) cast is
    # exact and (U - U % n) / n is the truncated scale-4 quotient
    u = (
        f"CAST(CAST(sum({d}{arg}) AS DECIMAL(38,{s})) * 10000 "
        f"AS DECIMAL(38,0))"
    )
    n = f"CAST(count({d}{arg}) AS DECIMAL(20,0))"
    return (
        f"CAST(({u} - ({u} % {n})) / {n} / 10000 AS DECIMAL(38,4))"
    )


def doris_avg_fixup(spark, stmt: str, df) -> str | None:
    """Return a rewritten statement with Doris-typed avg semantics, or
    None when no call site needs (or safely admits) the rewrite."""
    sites = list(_call_sites(stmt))
    if not sites:
        return None
    try:
        scales = _collect_scales(df._jdf)
    except Exception:
        return None
    if not any(0 <= s < 4 for s in scales.values()):
        return None
    out, changed, pos = [], False, 0
    for start, end, arg, distinct, windowed in sites:
        s = scales.get(_norm_arg(arg))
        if windowed or s is None or not (0 <= s < 4):
            continue
        out.append(stmt[pos:start])
        out.append(_formula(arg, distinct, s))
        pos = end
        changed = True
    if not changed:
        return None
    out.append(stmt[pos:])
    return "".join(out)
