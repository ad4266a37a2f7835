"""ASOF JOIN SQL syntax -> Spark SQL lateral rewrite.

Reference: Doris grammar `ASOF (LEFT|INNER)? JOIN`
(fe/fe-sql-parser/.../DorisParser.g4:1467-1468), join ops TJoinOp
ASOF_* 12-15 (gensrc/thrift/PlanNodes.thrift:1040-1063), probe impls
be/src/exec/operator/join/asof_left_inner_join_impl.cpp. Doc semantics:
regression-test/suites/doc/query-data/asof-join.md.groovy.

Spark has no ASOF join. Each `L ASOF [LEFT|INNER] JOIN R ON eq... AND
ineq` becomes a correlated LATERAL subquery that keeps the single best
match per left row:

    FROM t ASOF LEFT JOIN q ON t.sym = q.sym AND t.ts >= q.ts
    -->
    FROM t LEFT JOIN LATERAL (
        SELECT * FROM q WHERE t.sym = q.sym AND t.ts >= q.ts
        ORDER BY q.ts DESC LIMIT 1
    ) q ON true

Catalyst decorrelates the LIMIT-1 subquery into a window-ranked join
(DecorrelateInnerQuery) — no per-row re-execution. PLAN CAVEAT
(measured, see PLANS.md): the decorrelated domain join pairs
DISTINCT(left time values) with the right side through a
BroadcastNestedLoopJoin on the inequality BEFORE the per-key window
prune, so the intermediate is |distinct left times| x |right rows| —
fine at doc/test scale, quadratic-ish at 100 TB. The SQL surface exists
for dialect compatibility (the reference's asof-join.md suite runs
verbatim); large-scale pipelines should use the operator-level
DataFrame implementation (operators/asof.py), whose union+window plan
is a single shuffle on the equality keys with no cross product.
Multi-level ASOF chains compose: each join is rewritten independently
and later laterals may reference any earlier relation.
"""

from __future__ import annotations

import re

_ASOF = re.compile(r"\bASOF\s+(LEFT\s+|INNER\s+)?JOIN\b", re.I)
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
# clause keywords that end an ON condition at paren depth 0
_BOUNDARY = re.compile(
    r"\b(WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|UNION|EXCEPT|INTERSECT|"
    r"JOIN|LEFT|RIGHT|FULL|INNER|CROSS|ASOF|WINDOW)\b|[,)]",
    re.I,
)
_CMP = re.compile(r"(>=|<=|>|<)")
_KEYWORDS = {"on", "where", "group", "order", "limit", "having", "join",
             "left", "right", "full", "inner", "cross", "asof", "as",
             "match_condition"}


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\n\r":
        i += 1
    return i


def _scan_balanced(s: str, i: int) -> int:
    """i points at '('; return index just past the matching ')'."""
    depth, in_str = 0, None
    while i < len(s):
        c = s[i]
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
                return i + 1
        i += 1
    return i


def _split_conjuncts(cond: str) -> list[str]:
    parts, depth, cur, i, in_str = [], 0, [], 0, None
    up = cond.upper()
    while i < len(cond):
        c = cond[i]
        if in_str:
            cur.append(c)
            if c == in_str:
                in_str = None
            i += 1
            continue
        if c in ("'", '"'):
            in_str = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if depth == 0 and up.startswith("AND", i) and (
            i + 3 >= len(cond) or not cond[i + 3].isalnum()
        ) and (i == 0 or not cond[i - 1].isalnum()):
            parts.append("".join(cur).strip())
            cur = []
            i += 3
            continue
        cur.append(c)
        i += 1
    if "".join(cur).strip():
        parts.append("".join(cur).strip())
    return parts


def _refs(expr: str, alias: str) -> bool:
    return re.search(rf"\b{re.escape(alias)}\s*\.", expr) is not None


def rewrite_asof(sql: str) -> str:
    """Expand every ASOF join in `sql`; non-ASOF SQL passes through."""
    while True:
        m = _ASOF.search(sql)
        if m is None:
            return sql
        kind = (m.group(1) or "INNER").strip().upper()
        i = _skip_ws(sql, m.end())

        # right relation: table name or (subquery), then optional alias
        if i < len(sql) and sql[i] == "(":
            j = _scan_balanced(sql, i)
            rtable = sql[i:j]
        else:
            mm = _IDENT.match(sql, i)
            if mm is None:
                return sql  # unparseable; leave untouched
            rtable = mm.group(0)
            j = mm.end()
        k = _skip_ws(sql, j)
        ralias = None
        mm = _IDENT.match(sql, k)
        if mm and mm.group(0).lower() == "as":
            k = _skip_ws(sql, mm.end())
            mm = _IDENT.match(sql, k)
        if mm and mm.group(0).lower() not in _KEYWORDS:
            ralias = mm.group(0)
            k = mm.end()
        if ralias is None:
            ralias = rtable.split(".")[-1]
        k = _skip_ws(sql, k)
        # Doris grammar: ASOF ... JOIN rel MATCH_CONDITION(<ineq>) ON <eqs>
        # (DorisParser.g4 joinCriteria); the bare ON-with-inequality form
        # is accepted too.
        match_cond = None
        if sql[k : k + 15].upper() == "MATCH_CONDITION":
            p = _skip_ws(sql, k + 15)
            if p < len(sql) and sql[p] == "(":
                pend = _scan_balanced(sql, p)
                match_cond = sql[p + 1 : pend - 1].strip()
                k = _skip_ws(sql, pend)
        if not sql[k : k + 2].upper() == "ON":
            return sql
        k = _skip_ws(sql, k + 2)

        # ON condition extends to the next top-level clause boundary
        end, depth, in_str = k, 0, None
        while end < len(sql):
            c = sql[end]
            if in_str:
                if c == in_str:
                    in_str = None
                end += 1
                continue
            if c in ("'", '"'):
                in_str = c
                end += 1
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            if depth == 0:
                bm = _BOUNDARY.match(sql, end)
                if bm and not (end > 0 and (sql[end - 1].isalnum() or sql[end - 1] == "_")):
                    break
            end += 1
        cond = sql[k:end].strip()

        conjuncts = _split_conjuncts(cond)
        if match_cond is not None:
            conjuncts = conjuncts + _split_conjuncts(match_cond)
        ineq = None
        for cj in conjuncts:
            cm = _CMP.search(cj)
            if cm and _refs(cj, ralias):
                ineq = (cj, cm)
        if ineq is None:
            return sql  # no inequality referencing the right side
        cj, cm = ineq
        op = cm.group(1)
        lhs, rhs = cj[: cm.start()].strip(), cj[cm.end() :].strip()
        # the match column of the RIGHT table orders the lateral pick
        if _refs(rhs, ralias) and not _refs(lhs, ralias):
            right_expr, right_on_left = rhs, False
        else:
            right_expr, right_on_left = lhs, True
        # backward asof (pick the LARGEST right value <= left) when the
        # right side is the smaller operand; forward asof otherwise
        if (not right_on_left and op in (">", ">=")) or (
            right_on_left and op in ("<", "<=")
        ):
            direction = "DESC"
        else:
            direction = "ASC"

        inner = (
            f"SELECT * FROM {rtable} {ralias} WHERE "
            + " AND ".join(conjuncts)
            + f" ORDER BY {right_expr} {direction} LIMIT 1"
        )
        if kind == "LEFT":
            repl = f"LEFT JOIN LATERAL ({inner}) {ralias} ON true "
        else:
            repl = f"JOIN LATERAL ({inner}) {ralias} ON true "
        sql = sql[: m.start()] + repl + sql[end:]
