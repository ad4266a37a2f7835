"""search() DSL — boolean full-text query compiled to Catalyst predicates.

Reference: Doris's search() function and its query grammar
(be/src/exprs/function/function_search.h; FE grammar SearchParser.g4
under fe/fe-catalog/.../analysis/): `search('title:spark AND
(body:join OR body:"hash join") AND NOT body:broken')`.

Spark-first: the DSL is parsed on the driver (queries are tiny) and
compiled to a tree of the match_* predicates from operators/textops —
pure Column expressions (array_contains / padded-substring), so the whole
search runs inside whole-stage codegen and benefits from predicate
pushdown ordering like any other filter. No Python at execution time.

Grammar (case-insensitive keywords):
    expr   := term (OR term)*
    term   := factor ((AND)? factor)*        -- adjacency = AND
    factor := NOT factor | '(' expr ')' | clause
    clause := [field ':'] (word | '"' phrase '"' | prefix*)
A trailing '*' on a word makes it a prefix clause ('spark jo*' via a
quoted phrase: "spark jo"*).
"""

from __future__ import annotations

import re

from pyspark.sql import Column

from doris_spark.operators.textops import match_any, match_phrase, match_phrase_prefix

_TOKEN_RE = re.compile(
    r"""\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<phrase>"[^"]*"\*?)
        |(?P<word>[^\s()"]+))""",
    re.VERBOSE,
)


class _Parser:
    def __init__(self, query: str, default_field: str, fields: dict[str, str]):
        self.toks = self._lex(query)
        self.pos = 0
        self.default_field = default_field
        self.fields = fields

    @staticmethod
    def _lex(query: str):
        toks, pos = [], 0
        while pos < len(query):
            m = _TOKEN_RE.match(query, pos)
            if m is None:
                raise ValueError(f"search(): cannot tokenize at {query[pos:]!r}")
            if m.end() == pos:
                break
            for kind in ("lparen", "rparen", "phrase", "word"):
                if m.group(kind) is not None:
                    toks.append((kind, m.group(kind)))
                    break
            pos = m.end()
        return toks

    def _peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.pos += 1
        return t

    # expr := term (OR term)*
    def expr(self) -> Column:
        left = self.term()
        while self._peek() == ("word", "OR") or (
            self._peek()[0] == "word" and self._peek()[1].upper() == "OR"
        ):
            self._next()
            left = left | self.term()
        return left

    # term := factor ((AND)? factor)*
    def term(self) -> Column:
        left = self.factor()
        while True:
            kind, val = self._peek()
            if kind is None or kind == "rparen":
                return left
            if kind == "word" and val.upper() == "OR":
                return left
            if kind == "word" and val.upper() == "AND":
                self._next()
                left = left & self.factor()
            else:
                left = left & self.factor()

    def factor(self) -> Column:
        kind, val = self._peek()
        if kind == "word" and val.upper() == "NOT":
            self._next()
            return ~self.factor()
        if kind == "lparen":
            self._next()
            inner = self.expr()
            k, _ = self._next()
            if k != "rparen":
                raise ValueError("search(): unbalanced parentheses")
            return inner
        return self.clause()

    def clause(self) -> Column:
        kind, val = self._next()
        if kind not in ("word", "phrase"):
            raise ValueError(f"search(): expected clause, got {val!r}")
        field = self.default_field
        if kind == "word" and ":" in val:
            fname, rest = val.split(":", 1)
            field = self._resolve(fname)
            if rest:
                val = rest
            else:  # field:"phrase" — the phrase is the next token
                kind, val = self._next()
                if kind != "phrase":
                    raise ValueError("search(): dangling field prefix")
        col = self.fields.get(field, field)
        if kind == "phrase" or val.startswith('"'):
            body = val
            prefix = body.endswith("*")
            body = body.rstrip("*").strip('"')
            if prefix:
                return match_phrase_prefix(col, body)
            return match_phrase(col, body)
        if val.endswith("*"):
            return match_phrase_prefix(col, val.rstrip("*"))
        return match_any(col, [val])

    def _resolve(self, fname: str) -> str:
        if fname not in self.fields and fname != self.default_field:
            raise ValueError(f"search(): unknown field {fname!r}")
        return fname


def search(
    query: str,
    default_field: str,
    fields: dict[str, str] | None = None,
) -> Column:
    """Compile a search DSL string to a boolean Column.

    `fields` maps DSL field names to DataFrame column names (the default
    field maps to itself when absent)."""
    p = _Parser(query, default_field, fields or {})
    if not p.toks:
        raise ValueError("search(): empty query")
    out = p.expr()
    if p.pos != len(p.toks):
        raise ValueError(f"search(): trailing tokens {p.toks[p.pos:]!r}")
    return out
