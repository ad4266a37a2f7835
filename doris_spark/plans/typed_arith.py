"""Doris binary-arithmetic type coercion as a text-level typed pass.

Doris's FE coerces the operands of every binary arithmetic expression
with rules that differ from Spark's (reference:
fe/fe-core/.../nereids/util/TypeCoercionUtils.java:824
processBinaryArithmetic, getNumResultType:405, NUMERIC_PRECEDENCE:144;
per-op decimal result types in nereids/trees/expressions/{Add,Subtract,
Multiply,Divide,Mod}.java; integer promotion DataType.java:94
PROMOTION_MAP). The observable differences pinned by
regression-test/suites/nereids_arith_p0/*:

- date/datetime in arithmetic become their PACKED-DIGIT bigint
  (2012-03-01 -> 20120301, 2012-03-01 01:00:01 -> 20120301010001),
  not Spark's date_add/epoch-seconds semantics.
- strings/HLL/TIME/JSON become DOUBLE, bool/NULL become TINYINT.
- bit ops (& | ^) and DIV cast fractional operands to BIGINT.
- fixed-point add/sub/mul/mod promote the common type one step
  (tinyint->smallint, smallint->int, int->bigint).
- `/` on fixed-point integers is DOUBLE division.
- DECIMALV3 arithmetic computes Doris's own precision/scale
  (add/sub: max scale + widened integral; mul: p1+p2/s1+s2 with the
  38-cap rebalance; div: p1+s2+4 with scale s1+s2+4) and DECIMALV2
  folds everything to DECIMAL(27,9).

A text-only pass can apply these rules when every leaf's Doris type is
known: table columns come from the DDL-time hints
(plans/type_hints.py, registered by the suite harness and Engine DDL
paths), literals carry their own types, CAST leaves are typed by their
target. Any region with an un-typable leaf is left exactly as written
(Spark semantics) — the pass is additive and conservative, and it is a
no-op for programmatic DataFrame queries (no hints registered).

The expression grammar is parsed with MySQL/Doris operator precedence
(^ binds tighter than * which binds tighter than + which binds tighter
than & which binds tighter than |) and the rewrite is emitted fully
parenthesized, so Spark's different native precedence for ^/&/| never
leaks in.
"""

from __future__ import annotations

import re

from doris_spark.plans.sqltok import lit_spans as _lit_spans
from doris_spark.plans import type_hints

# ---------------------------------------------------------------------------
# Doris-side type model: tuples
#   ('bool',) ('null',)
#   ('i', w)          w in {1,2,4,8,16}  (tinyint..largeint)
#   ('float',) ('double',)
#   ('d2', p, s)      decimalv2
#   ('d3', p, s)      decimalv3
#   ('date',) ('dt', scale) ('str',)
# None = unknown (bail).

_INT_W = {"tinyint": 1, "smallint": 2, "int": 4, "integer": 4, "bigint": 8,
          "largeint": 16}

_HINT_RE = re.compile(
    r"^(boolean|bool|tinyint|smallint|int|integer|bigint|largeint|float"
    r"|double|decimalv2|decimalv3|decimal|datev2|date|datetimev2|datetime"
    r"|char|varchar|string|text)(?:\((\d+)(?:,(\d+))?\))?$"
)


def _type_from_hint(t: str):
    m = _HINT_RE.match(t)
    if not m:
        return None
    base, a, b = m.group(1), m.group(2), m.group(3)
    if base in ("boolean", "bool"):
        return ("bool",)
    if base in _INT_W:
        return ("i", _INT_W[base])
    if base == "float":
        return ("float",)
    if base == "double":
        return ("double",)
    if base == "decimalv2":
        return ("d2", int(a or 9), int(b or 0))
    if base in ("decimal", "decimalv3"):
        return ("d3", int(a or 9), int(b or 0))
    if base in ("date", "datev2"):
        return ("date",)
    if base in ("datetime", "datetimev2"):
        return ("dt", int(a or 0))
    return ("str",)


# lambda parameter names of the CURRENT statement: identifiers bound by
# `x ->` / `(x, y) ->` shadow any same-named table column — typing them
# from the hint registry rewrote ARRAY_MAP(x -> x+1, decimals) with the
# WRONG coercion (nereids_syntax_p0/array_function.groovy)
_LAMBDA_PARAMS: set = set()


def _col_type(name: str):
    key = name.strip().strip("`").lower()
    key = key.split(".")[-1].strip("`")
    if key in _LAMBDA_PARAMS:
        return None
    if not re.fullmatch(r"[a-z_]\w*", key):
        return None
    t = type_hints.lookup(key)
    return _type_from_hint(t) if t else None


_CAST_TARGET = re.compile(
    r"\bAS\s+([a-z_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)\s*\)?\s*$",
    re.I,
)
_SPARK_CAST_T = {
    "tinyint": ("i", 1), "smallint": ("i", 2), "int": ("i", 4),
    "integer": ("i", 4), "bigint": ("i", 8), "float": ("float",),
    "real": ("float",), "double": ("double",), "boolean": ("bool",),
    "date": ("date",), "timestamp": ("dt", 6), "string": ("str",),
}


def _cast_leaf_type(inner: str):
    """Type of a CAST(x AS T) leaf from its textual target T."""
    m = _CAST_TARGET.search(inner)
    if not m:
        return None
    t = re.sub(r"\s+", "", m.group(1).lower())
    dm = re.match(r"(decimal(?:v2|v3)?|datetime(?:v2)?|varchar|char)"
                  r"(?:\((\d+)(?:,(\d+))?\))?$", t)
    if dm:
        return _type_from_hint(t)
    return _SPARK_CAST_T.get(t)


# ---------------------------------------------------------------------------
# numeric coercion rules (TypeCoercionUtils.java)

def _num_result(t):
    """getNumResultType: the numeric type a non-numeric operand becomes."""
    if t[0] in ("i", "float", "double", "d2", "d3"):
        return t
    if t[0] in ("bool", "null"):
        return ("i", 1)
    if t[0] in ("date", "dt"):
        return ("i", 8)
    if t[0] == "str":
        return ("double",)
    return None


_PRECEDENCE = [("double",), ("float",), ("i", 16), ("i", 8), ("i", 4),
               ("i", 2), ("i", 1)]


def _common_type(t1, t2):
    for dt in _PRECEDENCE:
        if t1 == dt or t2 == dt:
            return dt
    return t1


def _promote(t):
    if t == ("i", 1):
        return ("i", 2)
    if t == ("i", 2):
        return ("i", 4)
    if t == ("i", 4):
        return ("i", 8)
    if t == ("float",):
        return ("double",)
    return t


def _d3_for(t):
    """DecimalV3Type.forType widths (DecimalV3Type.java:51-70)."""
    if t[0] == "d3":
        return t
    if t[0] == "d2":
        return ("d3", t[1], t[2])
    return {
        ("bool",): ("d3", 1, 0), ("null",): ("d3", 1, 0),
        ("i", 1): ("d3", 3, 0), ("i", 2): ("d3", 5, 0),
        ("i", 4): ("d3", 10, 0), ("i", 8): ("d3", 20, 0),
        ("i", 16): ("d3", 38, 0), ("float",): ("d3", 14, 7),
        ("double",): ("d3", 30, 15),
    }.get(t)


def _d3_overflow(integral: int, scale: int, max_integral: int):
    """BinaryArithmetic.processDecimalV3OverFlow (decimal128 tier)."""
    precision = integral + scale
    if precision > 38:
        precision = 38
        scale = precision - max_integral
    return ("d3", precision, max(scale, 0))


def _d3_ret(op: str, dt1, dt2):
    """Per-op decimalv3 result type ({Add,Multiply,Divide,Mod}.java)."""
    p1, s1, p2, s2 = dt1[1], dt1[2], dt2[1], dt2[2]
    if op in ("+", "-"):
        ts = max(s1, s2)
        integ = max(p1 - s1, p2 - s2)
        return _d3_overflow(integ + 1, ts, integ)
    if op == "%":
        ts = max(s1, s2)
        integ = max(p1 - s1, p2 - s2)
        return _d3_overflow(integ, ts, integ)
    if op == "*":
        p, s = p1 + p2, s1 + s2
        if p > 38:
            boundary = 38 - 6  # decimalOverflowScale session default 6
            if p - s < boundary:
                s = 38 - (p - s)
            elif p - s > boundary and s < 6:
                pass
            else:
                s = 6
            p = 38
        return ("d3", p, s)
    if op == "/":
        p = p1 + s2 + 4  # Config.div_precision_increment = 4
        s = s1
        if p > 38:
            boundary = 38 - 6
            if p - s < boundary:
                s = 38 - (p - s)
            elif p - s > boundary and s < 6:
                pass
            else:
                s = 6
            p = 38
        s = min(p, s + s2 + 4)
        # Divide.getDataTypeForDecimalV3 computes the LEFT-CAST type
        # (p, s); the BE then divides that scaled integer by the
        # s2-scaled right operand, so the RESULT's runtime scale is
        # s - s2 (normally s1 + 4): `k3/k5` over INT/DECIMAL(9,3)
        # renders scale 4, and DECIMAL(9,3)/DECIMAL(7,6) is scale 7
        # with integral room p - s + s2 (nereids_syntax_p0
        # test_arithmetic_operators arith_op11/op21)
        return ("d3", p, max(0, s - s2))
    return None


def _spark_type_name(t) -> str | None:
    if t == ("i", 1):
        return "TINYINT"
    if t == ("i", 2):
        return "SMALLINT"
    if t == ("i", 4):
        return "INT"
    if t == ("i", 8):
        return "BIGINT"
    if t == ("i", 16):
        return "DECIMAL(38,0)"
    if t == ("float",):
        return "FLOAT"
    if t == ("double",):
        return "DOUBLE"
    if t[0] in ("d3", "d2"):
        p, s = t[1], t[2]
        if p > 38:  # decimal256 tier: platform narrowing
            s = max(0, min(s, 38 - (p - s))) if p - s < 38 else 0
            p = 38
        return f"DECIMAL({p},{s})"
    return None


class _Val:
    __slots__ = ("text", "type")

    def __init__(self, text, type_):
        self.text = text
        self.type = type_


def _to_numeric(v: _Val) -> _Val | None:
    """Cast a non-numeric operand to its getNumResultType form.
    Datelike uses the Doris packed-digit bigint (cast date -> bigint is
    yyyyMMdd as a number in Doris's BE, not epoch anything)."""
    t = v.type
    if t[0] in ("i", "float", "double", "d2", "d3", "bool", "null"):
        return v  # numeric/boolean operands are NOT pre-cast (FE keeps them)
    if t[0] == "date":
        return _Val(
            f"CAST(date_format({v.text}, 'yyyyMMdd') AS BIGINT)", ("i", 8))
    if t[0] == "dt":
        return _Val(
            f"CAST(date_format({v.text}, 'yyyyMMddHHmmss') AS BIGINT)",
            ("i", 8))
    if t[0] == "str":
        return _Val(f"CAST({v.text} AS DOUBLE)", ("double",))
    return None


def _cast_to(v: _Val, t) -> _Val | None:
    if v.type == t:
        return v
    name = _spark_type_name(t)
    if name is None:
        return None
    return _Val(f"CAST({v.text} AS {name})", t)


_BITOPS = {"&", "|", "^"}


def _emit(op: str, lv: _Val, rv: _Val) -> _Val | None:
    """processBinaryArithmetic for one node; returns the rewritten text
    and the Doris result type, or None to bail."""
    t1 = _num_result(lv.type)
    t2 = _num_result(rv.type)
    if t1 is None or t2 is None:
        return None
    left = _to_numeric(lv)
    right = _to_numeric(rv)
    if left is None or right is None:
        return None
    if left.type[0] in ("bool", "null"):
        left = _Val(f"CAST({left.text} AS TINYINT)", ("i", 1))
    if right.type[0] in ("bool", "null"):
        right = _Val(f"CAST({right.text} AS TINYINT)", ("i", 1))

    common = _common_type(t1, t2)
    if common[0] in ("float", "double") and (t1[0] == "d3" or t2[0] == "d3"):
        common = ("double",)
    if t1[0] == "d2" or t2[0] == "d2":
        common = ("d2", 27, 9)  # DecimalV2Type.SYSTEM_DEFAULT

    def frac(t):
        return t[0] in ("float", "double", "d2", "d3")

    if op in _BITOPS or op == "DIV":
        tgt = ("i", 8) if (frac(t1) or frac(t2)) else common
        if tgt[0] != "i":
            tgt = ("i", 8)
        if op in _BITOPS and tgt == ("i", 16):
            # Spark's bit ops don't take DECIMAL(38,0); int64 carries the
            # in-range LARGEINT values (documented platform narrowing)
            tgt = ("i", 8)
        # LARGEINT columns are physically DOUBLE (ref_parity DDL
        # narrowing), so a leaf that CLAIMS ('i',16) must still be cast
        # to DECIMAL(38,0) before div/bit ops: force the cast here.
        name = _spark_type_name(tgt)
        lc = _Val(f"CAST({left.text} AS {name})", tgt)
        rc = _Val(f"CAST({right.text} AS {name})", tgt)
        sym = " div " if op == "DIV" else f" {op} "
        return _Val(f"({lc.text}{sym}{rc.text})", tgt)

    if op == "%" and t1 == ("float",) and t2 == ("float",):
        return _Val(f"({left.text} % {right.text})", ("float",))

    d2_vs_wide = (
        (t1[0] == "d3" or t1 in (("i", 8), ("i", 16))) and t2[0] == "d2"
    ) or (
        t1[0] == "d2" and (t2[0] == "d3" or t2 in (("i", 8), ("i", 16)))
    )

    if not d2_vs_wide and common[0] in ("float", "double"):
        # float common type: add/sub/mul/mod promote to DOUBLE
        # (FloatType.promotion()), divide casts children to DOUBLE —
        # float arithmetic never stays float (except float%float above)
        tgt = ("double",)
        lc, rc = _cast_to(left, tgt), _cast_to(right, tgt)
        if lc is None or rc is None:
            return None
        return _Val(f"({lc.text} {op} {rc.text})", tgt)

    if t1[0] == "d3" or t2[0] == "d3" or d2_vs_wide:
        dt1, dt2 = _d3_for(t1), _d3_for(t2)
        if dt1 is None or dt2 is None:
            return None
        ret = _d3_ret(op, dt1, dt2)
        if ret is None:
            return None
        if op in ("+", "-", "%"):
            lc, rc = _cast_to(left, ret), _cast_to(right, ret)
            if lc is None or rc is None:
                return None
            return _Val(f"({lc.text} {op} {rc.text})", ret)
        lc, rc = _cast_to(left, dt1), _cast_to(right, dt2)
        if lc is None or rc is None:
            return None
        out = f"({lc.text} {op} {rc.text})"
        # Spark's decimal mul/div picks its own precision/scale; pin
        # Doris's (values agree, the declared scale differs).
        name = _spark_type_name(ret)
        if op == "/":
            # the BE's int128 decimal division TRUNCATES toward zero at
            # the result scale (same behavior typed_avg.py pins for
            # avg); CAST alone would round HALF_UP
            # (nereids_arith_p0 DecimalV2_BigInt: 24.3952/5354529 ->
            # 0.0000045, not 0.0000046)
            s = ret[2] if ret[1] <= 38 else 0
            step = "1" if s == 0 else "0." + "0" * (s - 1) + "1"
            return _Val(
                f"CAST({out} - ({out} % {step}) AS {name})", ret)
        return _Val(f"CAST({out} AS {name})", ret)

    if t1[0] == "d2" or t2[0] == "d2":
        tgt = ("d2", 27, 9)
        if op in ("*", "/"):
            # children at DECIMAL(18,9): the Spark-native product/quotient
            # of two (27,9)s would hit the precision-loss scale floor
            # (scale 6) and drop digits the scale-9 DECIMALV2 result
            # keeps; (18,9) x (18,9) = (37,18) is lossless, then the
            # result is pinned back to SYSTEM_DEFAULT (27,9).
            nl = _cast_to(left, ("d3", 18, 9))
            nr = _cast_to(right, ("d3", 18, 9))
            if nl is None or nr is None:
                return None
            out = f"({nl.text} {op} {nr.text})"
            return _Val(f"CAST({out} AS DECIMAL(27,9))", tgt)
        lc, rc = _cast_to(left, tgt), _cast_to(right, tgt)
        if lc is None or rc is None:
            return None
        return _Val(f"({lc.text} {op} {rc.text})", tgt)

    if op == "/":
        lc = _cast_to(left, ("double",))
        rc = _cast_to(right, ("double",))
        return _Val(f"({lc.text} / {rc.text})", ("double",))

    tgt = _promote(common)
    lc, rc = _cast_to(left, tgt), _cast_to(right, tgt)
    if lc is None or rc is None:
        return None
    return _Val(f"({lc.text} {op} {rc.text})", tgt)


# ---------------------------------------------------------------------------
# tokenizer (span-preserving) + nesting + Pratt parser

_NUM = re.compile(
    r"0[xX][0-9a-fA-F]+|(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?")
_QUAL_ID = re.compile(
    r"(?:`[^`]*`|[A-Za-z_$][\w$]*)(?:\.(?:`[^`]*`|[A-Za-z_$][\w$]*|\*))*")

# words that terminate an arithmetic region. 'null'/'true'/'false'/
# 'date'/'timestamp'/'cast' are handled INSIDE the parser instead.
_BOUNDARY_WORDS = {
    "select", "from", "where", "group", "order", "having", "limit",
    "offset", "by", "as", "on", "and", "or", "not", "xor", "join",
    "inner", "left", "right", "full", "cross", "outer", "semi", "anti",
    "union", "all", "distinct", "intersect", "except", "minus", "case",
    "when", "then", "else", "end", "between", "in", "like", "rlike",
    "regexp", "is", "asc", "desc", "interval", "over", "partition",
    "rows", "range", "preceding", "following", "current", "unbounded",
    "using", "with", "values", "lateral", "exists", "match_any",
    "match_all", "match_phrase", "extract", "nulls", "first", "last",
    "ignore", "respect", "filter", "qualify", "tablesample", "asof",
    "window", "escape", "collate", "sounds", "separator", "grouping",
    "sets", "cube", "rollup", "natural", "any", "some", "straight_join",
}
_PARSER_WORDS = {"null", "true", "false", "date", "timestamp", "cast"}
_OP_WORDS = {"div", "mod"}
_CMP = ("<=>", "<>", "!=", ">=", "<=", "=", "<", ">")


class _Tok:
    __slots__ = ("kind", "text", "a", "b")

    def __init__(self, kind, text, a, b):
        self.kind = kind  # op/cmp/word/pword/id/num/str/lp/rp/comma/other
        self.text = text
        self.a = a
        self.b = b


def _tokenize(s: str):
    toks = []
    lits = sorted(_lit_spans(s))
    li = 0
    i, n = 0, len(s)
    while i < n:
        while li < len(lits) and lits[li][1] <= i:
            li += 1
        if li < len(lits) and lits[li][0] <= i:
            a, b = lits[li]
            toks.append(_Tok("str", s[a:b], a, b))
            i = b
            continue
        c = s[i]
        if c.isspace():
            i += 1
            continue
        two = s[i:i + 2]
        if two in ("||", "&&", "<<", ">>", "->", "=>"):
            toks.append(_Tok("other", two, i, i + 2))
            i += 2
            continue
        hit = next((t for t in _CMP if s.startswith(t, i)), None)
        if hit:
            toks.append(_Tok("cmp", hit, i, i + len(hit)))
            i += len(hit)
            continue
        if c in "+-*/%&|^":
            toks.append(_Tok("op", c, i, i + 1))
            i += 1
            continue
        if c == "~":
            toks.append(_Tok("tilde", c, i, i + 1))
            i += 1
            continue
        if c == "(":
            toks.append(_Tok("lp", c, i, i + 1))
            i += 1
            continue
        if c == ")":
            toks.append(_Tok("rp", c, i, i + 1))
            i += 1
            continue
        if c == ",":
            toks.append(_Tok("comma", c, i, i + 1))
            i += 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and s[i + 1].isdigit()):
            m = _NUM.match(s, i)
            toks.append(_Tok("num", m.group(0), i, m.end()))
            i = m.end()
            continue
        m = _QUAL_ID.match(s, i)
        if m:
            w = m.group(0)
            low = w.lower()
            if "." not in low and "`" not in low:
                if low in _BOUNDARY_WORDS:
                    toks.append(_Tok("word", w, i, m.end()))
                    i = m.end()
                    continue
                if low in _PARSER_WORDS:
                    toks.append(_Tok("pword", w, i, m.end()))
                    i = m.end()
                    continue
                if low in _OP_WORDS:
                    toks.append(_Tok("opword", w, i, m.end()))
                    i = m.end()
                    continue
            toks.append(_Tok("id", w, i, m.end()))
            i = m.end()
            continue
        toks.append(_Tok("other", c, i, i + 1))
        i += 1
    return toks


class _Node:
    """One processed item: a leaf token, or a paren group. Carries the
    original span, the (possibly rewritten) text, and a Doris type when
    known. Groups additionally carry their comma-split argument list
    [(text, type_or_None), ...] so function-shaped operators (BITAND /
    BITOR / BITXOR) can be folded into real binary ops."""
    __slots__ = ("kind", "text", "a", "b", "type", "tok", "args")

    def __init__(self, kind, text, a, b, type_=None, tok=None, args=None):
        self.kind = kind  # same kinds as _Tok, plus 'group', 'call'
        self.text = text
        self.a = a
        self.b = b
        self.type = type_
        self.tok = tok
        self.args = args


def _lit_type(tok):
    if tok.kind == "str":
        return ("str",)
    if tok.kind == "num":
        t = tok.text
        if "." in t and "e" not in t.lower() and not t.lower().startswith(
                "0x"):
            digits = t.replace(".", "").lstrip("0")
            frac = len(t.split(".", 1)[1])
            p = max(len(digits), frac, 1)
            return ("d3", p, frac)
        if "e" in t.lower() and not t.lower().startswith("0x"):
            return ("double",)
        try:
            v = int(t, 0)
        except ValueError:
            return None
        for w, lim in ((1, 1 << 7), (2, 1 << 15), (4, 1 << 31),
                       (8, 1 << 63), (16, 1 << 127)):
            if -lim <= v < lim:
                return ("i", w)
        return None
    return None


class _Bail(Exception):
    pass


def _stitch(s: str, nodes, lo: int, hi: int) -> str:
    """Original text from lo..hi with each node's (possibly rewritten)
    text substituted at its span; inter-node spacing is preserved
    verbatim from the source."""
    if not nodes:
        return s[lo:hi]
    out = [s[lo:nodes[0].a]]
    for k, nd in enumerate(nodes):
        out.append(nd.text)
        nxt = nodes[k + 1].a if k + 1 < len(nodes) else hi
        out.append(s[nd.b:nxt])
    return "".join(out)


def _process(s: str, toks, lo: int, hi: int):
    """Process token range [lo,hi): returns (nodes, changed) where nodes
    are top-level items with groups collapsed and regions rewritten."""
    # 1. collapse paren groups (recursively processed)
    items: list[_Node] = []
    changed = False
    i = lo
    while i < hi:
        t = toks[i]
        if t.kind == "lp":
            depth, j = 0, i
            while j < hi:
                if toks[j].kind == "lp":
                    depth += 1
                elif toks[j].kind == "rp":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if j >= hi:
                raise _Bail()
            inner_nodes, inner_changed, inner_type = _region_pass(
                s, toks, i + 1, j)
            changed = changed or inner_changed
            text = "(" + _stitch(s, inner_nodes, toks[i].b, toks[j].a) + ")"
            args = []
            seg: list[_Node] = []
            for nd in inner_nodes:
                if nd.kind == "comma":
                    args.append(
                        (seg[0].text, _leaf_type(seg[0]))
                        if len(seg) == 1 else
                        (_stitch(s, seg, seg[0].a, seg[-1].b), None)
                        if seg else ("", None))
                    seg = []
                else:
                    seg.append(nd)
            if seg:
                args.append((seg[0].text, _leaf_type(seg[0]))
                            if len(seg) == 1 else
                            (_stitch(s, seg, seg[0].a, seg[-1].b), None))
            items.append(_Node("group", text, toks[i].a, toks[j].b,
                               inner_type, args=args))
            i = j + 1
            continue
        items.append(_Node(t.kind, t.text, t.a, t.b, None, t))
        i += 1
    # 2. merge id/pword + group -> call leaf
    merged: list[_Node] = []
    for nd in items:
        if (nd.kind == "group" and merged
                and merged[-1].kind in ("id", "pword")
                and merged[-1].b == nd.a):
            fn = merged.pop()
            call = _Node("call", fn.text + nd.text, fn.a, nd.b)
            low = fn.text.lower()
            if low == "cast" or low.endswith(".cast"):
                call.type = _cast_leaf_type(nd.text)
            elif low == "abs" and nd.args and len(nd.args) == 1 and \
                    nd.args[0][1] and nd.args[0][1][0] in (
                        "bool", "date", "dt", "str"):
                # Doris abs() takes any numeric-coercible operand: bool
                # -> tinyint, datelike -> packed bigint, string -> double
                # (nereids_arith_p0/topn_alltype abs(kbool)/abs(kdtmv2))
                v = _to_numeric(_Val(nd.args[0][0], nd.args[0][1]))
                if v is not None:
                    vv = v if v.type[0] == "i" or v.type[0] in (
                        "float", "double") else _Val(
                        f"CAST({v.text} AS TINYINT)", ("i", 1))
                    call.text = f"abs({vv.text})"
                    call.type = vv.type
                    changed = True
            elif low in ("bitand", "bitor", "bitxor") and nd.args and \
                    len(nd.args) == 2 and all(t for _, t in nd.args):
                op = {"bitand": "&", "bitor": "|", "bitxor": "^"}[low]
                v = _emit(op, _Val(nd.args[0][0], nd.args[0][1]),
                          _Val(nd.args[1][0], nd.args[1][1]))
                if v is not None:
                    call.text, call.type = v.text, v.type
                    changed = True
            merged.append(call)
        else:
            merged.append(nd)
    return merged, changed


def _region_pass(s: str, toks, lo: int, hi: int):
    """Split [lo,hi) into arithmetic regions at boundary tokens, rewrite
    each; returns (nodes, changed, whole_type) where whole_type is the
    region's Doris type when the ENTIRE range is one typed expression."""
    merged, changed = _process(s, toks, lo, hi)
    # segment into regions separated by boundary tokens; a region
    # adjacent to a bare '.' boundary (spaced qualifier dot: `t2 . col`)
    # is POISONED — rewriting either side would detach the qualifier
    segments: list = []  # region list | boundary node
    region: list[_Node] = []
    for nd in merged:
        if nd.kind in ("comma", "cmp", "word", "other"):
            segments.append(region)
            segments.append(nd)
            region = []
        else:
            region.append(nd)
    segments.append(region)
    poisoned = set()
    for k, seg in enumerate(segments):
        if isinstance(seg, _Node) and seg.text == ".":
            poisoned.add(k - 1)
            poisoned.add(k + 1)

    out: list[_Node] = []
    whole_type = None
    n_regions = 0
    for k, seg in enumerate(segments):
        if isinstance(seg, _Node):
            out.append(seg)
            whole_type = None
            n_regions += 1
            continue
        if not seg:
            continue
        n_regions += 1
        has_op = any(nd.kind in ("op", "opword", "tilde") for nd in seg)
        # pure-literal arithmetic (lag(k, 1+1, 0) offsets, constant
        # folds) must stay textual: Spark folds it at parse time, and
        # several builtins require FOLDABLE literal arguments that a
        # CAST-wrapped rewrite would break. Doris literal typing agrees
        # with Spark's on in-range literal math anyway.
        # ~ over a string/date literal must still be coerced (Spark's
        # native ~ rejects non-integral operands outright)
        all_literal = not any(
            nd.kind == "tilde" for nd in seg) and all(
            nd.kind in ("num", "str", "op", "opword")
            or (nd.kind == "pword" and nd.text.lower() in
                ("null", "true", "false"))
            for nd in seg)
        if all_literal and any(
            nd.kind == "opword" and nd.text.lower() == "div"
            for nd in seg
        ) and any(
            (nd.kind == "op" and nd.text == "/")
            or (nd.kind == "num" and "." in nd.text)
            for nd in seg
        ):
            # `2 / 10 div 2`: Spark's literal typing REJECTS div over a
            # non-integral operand where Doris truncates — must rewrite
            all_literal = False
        if has_op and k not in poisoned and not all_literal:
            try:
                p = _ExprParser(seg)
                v = p.parse()
                if p.n_ops >= 1:
                    out.append(_Node("group", v.text, seg[0].a,
                                     seg[-1].b, v.type))
                    changed = True
                    whole_type = v.type
                    continue
            except _Bail:
                pass
        elif len(seg) == 1 and seg[0].kind in (
                "id", "num", "str", "group", "call"):
            whole_type = _leaf_type(seg[0])
        out.extend(seg)
    if n_regions != 1:
        whole_type = None
    return out, changed, whole_type


def _leaf_type(nd: _Node):
    if nd.kind == "id":
        return _col_type(nd.text)
    if nd.kind in ("group", "call"):
        return nd.type
    if nd.kind in ("num", "str"):
        return _lit_type(nd)
    return None


class _ExprParser:
    """Pratt parser over one region's nodes with MySQL precedence:
    | < & < +- < */% div mod < ^ < unary < primary."""

    def __init__(self, nodes):
        self.nodes = nodes
        self.i = 0
        self.n_ops = 0

    def peek(self):
        return self.nodes[self.i] if self.i < len(self.nodes) else None

    def parse(self) -> _Val:
        v = self._bitor()
        if self.i != len(self.nodes):
            raise _Bail()
        return v

    def _binop(self, sub, ops):
        v = sub()
        while True:
            t = self.peek()
            if t is not None and t.kind == "op" and t.text in ops:
                self.i += 1
                v = self._apply(t.text, v, sub())
            else:
                return v

    def _bitor(self):
        return self._binop(self._bitand, ("|",))

    def _bitand(self):
        return self._binop(self._addsub, ("&",))

    def _addsub(self):
        return self._binop(self._muldiv, ("+", "-"))

    def _muldiv(self):
        v = self._xor()
        while True:
            t = self.peek()
            if t is not None and (
                    (t.kind == "op" and t.text in ("*", "/", "%"))
                    or t.kind == "opword"):
                op = (t.text if t.kind == "op"
                      else ("DIV" if t.text.lower() == "div" else "%"))
                self.i += 1
                v = self._apply(op, v, self._xor())
            else:
                return v

    def _xor(self):
        # Unary minus/tilde bind TIGHTER than ^ in Doris — grammar
        # DorisParser.g4:1691 lists arithmeticUnary above the HAT
        # alternative, and the correctness_p0/test_bit_function golden
        # pins it: `-2^127` = (-2) XOR 127 = -127 (not -(2^127) = -125).
        # This deliberately differs from MySQL's documented table.
        return self._binop(self._unary, ("^",))

    def _unary(self) -> _Val:
        t = self.peek()
        if t is not None and t.kind == "tilde":
            # Doris bitnot: numeric-coerced operand folded to BIGINT
            # (~date = ~packed-digits; ~'a' = NULL via strict cast)
            self.i += 1
            v = self._unary()
            vn = _to_numeric(v)
            if vn is None:
                raise _Bail()
            c = _cast_to(vn, ("i", 8))
            if c is None or c.type != ("i", 8):
                c = _Val(f"CAST({vn.text} AS BIGINT)", ("i", 8))
            self.n_ops += 1
            return _Val(f"(~ {c.text})", ("i", 8))
        if t is not None and t.kind == "op" and t.text in ("+", "-"):
            self.i += 1
            v = self._unary()
            if t.text == "-":
                vn = _to_numeric(v)
                if vn is None:
                    raise _Bail()
                ty = vn.type if vn.type[0] not in ("bool", "null") else (
                    "i", 1)
                return _Val(f"(- {vn.text})", ty)
            return v
        return self._primary()

    def _primary(self) -> _Val:
        t = self.peek()
        if t is None:
            raise _Bail()
        if t.kind in ("num", "str"):
            ty = _lit_type(t)
            if ty is None:
                raise _Bail()
            self.i += 1
            return _Val(t.text, ty)
        if t.kind in ("id", "group", "call"):
            ty = _leaf_type(t)
            if ty is None:
                raise _Bail()
            self.i += 1
            return _Val(t.text, ty)
        if t.kind == "pword":
            low = t.text.lower()
            if low == "null":
                self.i += 1
                return _Val("NULL", ("null",))
            if low in ("true", "false"):
                self.i += 1
                return _Val(t.text, ("bool",))
            if low in ("date", "timestamp"):
                nxt = (self.nodes[self.i + 1]
                       if self.i + 1 < len(self.nodes) else None)
                if nxt is not None and nxt.kind == "str":
                    self.i += 2
                    return _Val(
                        f"{t.text} {nxt.text}",
                        ("date",) if low == "date" else ("dt", 6))
        raise _Bail()

    def _apply(self, op, l, r) -> _Val:
        v = _emit(op, l, r)
        if v is None:
            raise _Bail()
        self.n_ops += 1
        return v


_ARITH_CHARS = re.compile(
    r"[+\-*/%&|^~]|\b(?:div|mod|bitand|bitor|bitxor|abs)\b", re.I)


def arith_rewrite(stmt: str) -> str:
    """Apply Doris binary-arithmetic coercion to every fully-typable
    arithmetic region of `stmt`. Regions with unknown leaves, INTERVAL
    arithmetic, subqueries, or any parse surprise are left byte-for-byte
    untouched (Spark semantics)."""
    if not type_hints.COLUMN_TYPES and not type_hints.SCOPED:
        return stmt
    if not _ARITH_CHARS.search(stmt):
        return stmt
    if re.search(r"(?i)\bgrouping\s+sets\b|\bwith\s+rollup\b|"
                 r"\bcube\s*\(", stmt):
        # Spark resolves HAVING/grouping() references against grouping-
        # set expressions by EXACT tree match; a CAST-wrapped rewrite of
        # `k1+1` in one position but not the other (or even in both —
        # UnresolvedHaving re-binds through the raw column) breaks that
        # match (nereids_syntax_p0/grouping_sets.groovy HAVING cases).
        return stmt
    global _LAMBDA_PARAMS
    _LAMBDA_PARAMS = {
        p.strip().strip("`").lower()
        for m in re.finditer(
            r"(?:\(\s*((?:`?\w+`?\s*,\s*)*`?\w+`?)\s*\)|(`?\w+`?))"
            r"\s*->", stmt)
        for p in (m.group(1) or m.group(2)).split(",")
    }
    try:
        toks = _tokenize(stmt)
        nodes, changed, _ = _region_pass(stmt, toks, 0, len(toks))
        if not changed:
            return stmt
        return _stitch(stmt, nodes, 0, len(stmt))
    except Exception:
        return stmt
    finally:
        _LAMBDA_PARAMS = set()
