"""Shared quote/paren-aware SQL text scanning primitives.

One tokenizer for every text-rewrite tier (plans/dialect.py,
plans/sql_macros.py, plans/typed_arith.py, plans/column_cast.py,
plans/unnest_rewrite.py). Both round-10 ADVICE bugs (chained RIGHT
SEMI/ANTI rewriting at stale offsets, `_is_bool_sub` corrupting string
literals) were caused by per-module re-implementations of these scans
drifting apart — in particular, some inline scanners ignored
MySQL backslash escapes (``'a\\'b'``) that `_lit_spans` handled.

Canonical literal rules (matching the reference FE's MySQL-compatible
lexer, fe/fe-sql-parser DorisLexer: STRING_LITERAL):
- '...' and "..." delimit string literals;
- a backslash escapes the next char inside a literal;
- a doubled quote ('' or "") inside a same-quoted literal is an
  escaped quote, not a terminator.

Property tests: tests/test_sqltok_properties.py.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable


def lit_spans(text: str) -> list[tuple[int, int]]:
    """[start, end) spans of '...' / "..." string literals, honoring
    backslash-escaped and doubled-quote escapes."""
    spans, i, n = [], 0, len(text)
    while i < n:
        c = text[i]
        if c in ("'", '"'):
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    if j + 1 < n and text[j + 1] == c:  # doubled-quote
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        else:
            i += 1
    return spans


def in_spans(spans: Iterable[tuple[int, int]], i: int) -> bool:
    return any(a <= i < b for a, b in spans)


def sub_outside_literals(pattern, repl, text: str, flags=0) -> str:
    """re.sub that skips matches starting inside string literals."""
    pat = re.compile(pattern, flags) if isinstance(pattern, str) else pattern
    spans = lit_spans(text)

    def guarded(m: re.Match) -> str:
        if in_spans(spans, m.start()):
            return m.group(0)
        return repl(m) if callable(repl) else m.expand(repl)

    # spans computed once remain valid: guarded() returns the original
    # text for in-literal matches (no length change there), and re.sub
    # scans left-to-right over the ORIGINAL string.
    return pat.sub(guarded, text)


def split_args_top(text: str) -> list[str]:
    """Split on top-level commas (outside quotes/parens/brackets)."""
    out, depth, in_q, cur = [], 0, None, []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if in_q:
            cur.append(ch)
            if ch == "\\" and i + 1 < n:
                cur.append(text[i + 1])
                i += 2
                continue
            if ch == in_q:
                if i + 1 < n and text[i + 1] == in_q:
                    cur.append(text[i + 1])
                    i += 2
                    continue
                in_q = None
            i += 1
            continue
        if ch in ("'", '"'):
            in_q = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def find_close(text: str, i: int) -> int:
    """`i` points at '(' (or '['); return the index OF the matching
    close, or len(text) if unbalanced. Quote-aware (canonical escapes)."""
    opener = text[i]
    closer = {"(": ")", "[": "]"}[opener]
    spans = lit_spans(text[i:])
    depth, j, n = 0, i, len(text)
    while j < n:
        if in_spans(spans, j - i):
            j += 1
            continue
        c = text[j]
        if c == opener:
            depth += 1
        elif c == closer:
            depth -= 1
            if depth == 0:
                return j
        j += 1
    return n


def find_open_back(text: str, i: int) -> int:
    """`i` points at ')'; return the index of the matching '(', or -1.
    Backwards scan; quote-aware via forward span computation."""
    spans = lit_spans(text)
    depth, j = 0, i
    while j >= 0:
        if in_spans(spans, j):
            j -= 1
            continue
        c = text[j]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
            if depth == 0:
                return j
        j -= 1
    return -1


def depth0_search(
    text: str, pattern, start: int = 0, flags=0
) -> re.Match | None:
    """First regex match at paren-depth 0 AND outside literals,
    scanning from `start`. Depth is measured relative to `start`."""
    pat = re.compile(pattern, flags) if isinstance(pattern, str) else pattern
    spans = lit_spans(text)
    depth, i, n = 0, start, len(text)
    while i < n:
        if in_spans(spans, i):
            i += 1
            continue
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return None  # left the enclosing block
        elif depth == 0:
            m = pat.match(text, i)
            if m:
                return m
        i += 1
    return None


def scan_ident_back(text: str, i: int) -> tuple[int, str]:
    """Scan an identifier ENDING at index i (inclusive); returns
    (start_index, identifier) — identifier may be ''."""
    k = i
    while k >= 0 and (text[k].isalnum() or text[k] == "_"):
        k -= 1
    return k + 1, text[k + 1 : i + 1]
