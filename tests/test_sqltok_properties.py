"""Property tests for the shared SQL tokenizer (plans/sqltok.py).

Round-9/-10 ADVICE both flagged bugs from per-module scanner drift
(stale-offset rewrites, literal corruption). These pin the shared
primitives' invariants and that the macro tiers preserve
literal content and paren balance.
"""

import re

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except Exception:  # pragma: no cover
    HAVE_HYP = False

from doris_spark.plans.sqltok import (
    find_close,
    find_open_back,
    in_spans,
    lit_spans,
    split_args_top,
    sub_outside_literals,
)

sql_text = st.text(
    alphabet=st.sampled_from(list("ab_ ,()[]'\"\\x1+-")), max_size=60
)


@settings(max_examples=300, deadline=None)
@given(sql_text)
def test_lit_spans_invariants(s):
    spans = lit_spans(s)
    prev_end = 0
    for a, b in spans:
        assert 0 <= a < b <= len(s)
        assert a >= prev_end, "spans must not overlap"
        assert s[a] in "'\""
        prev_end = b


@settings(max_examples=300, deadline=None)
@given(sql_text)
def test_sub_outside_literals_preserves_literal_content(s):
    out = sub_outside_literals(r"[ab]", "Z", s)
    # every literal span's inner content must appear verbatim in out
    for a, b in lit_spans(s):
        assert s[a:b] in out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="abc(_)'x", max_size=8), max_size=5))
def test_split_args_top_roundtrip_balanced(parts):
    # join balanced, quote-closed fragments; split must return them
    def balanced(p):
        if not p.strip() or "," in p:
            return False
        spans = lit_spans(p)
        if any(p[b - 1] not in "'\"" or b - a < 2 for a, b in spans):
            return False  # unterminated literal
        # doubled-quote ambiguity: a fragment ending like ''' scans as
        # closed alone but re-opens when text follows — reject when a
        # trailing sentinel would land inside a literal
        if any(b > len(p) for _a, b in lit_spans(p + "\x01x")):
            return False
        depth = 0
        for i, ch in enumerate(p):
            if in_spans(spans, i):
                continue
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    return False
        return depth == 0

    parts = [p.strip() for p in parts if balanced(p)]
    joined = ", ".join(parts)
    assert split_args_top(joined) == parts


@settings(max_examples=300, deadline=None)
@given(sql_text)
def test_find_close_matches(s):
    for i, c in enumerate(s):
        if c == "(" and not in_spans(lit_spans(s), i):
            j = find_close(s, i)
            if j < len(s):
                assert s[j] == ")"
                assert find_open_back(s, j) == i


MACRO_SAMPLES = [
    "select group_concat(x, ',' order by y) from t",
    "select nvl(a, 'it''s'), if(a > 1, 'y\\'s', 'n') from t",
    "select window_funnel(3600, 'default', ts, e = 'a', e = 'b') from t",
    "select map_agg(k, v)[null], histogram(x) from t group by g",
    "select retention(d = 1, d = 2), percentile(x, 0.5) from t",
    "select t.tag from x, unnest(tags) with ordinality as t(pos, tag)",
]


@pytest.mark.parametrize("sql", MACRO_SAMPLES)
def test_macro_output_balanced(sql):
    """Macro/dialect output must keep parens balanced and literals
    intact (re-parseable shape)."""
    from doris_spark.plans.dialect import dialect
    from doris_spark.plans.sql_macros import rewrite

    out = rewrite(dialect(sql))
    spans = lit_spans(out)
    depth = 0
    for i, ch in enumerate(out):
        if in_spans(spans, i):
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            assert depth >= 0, out
    assert depth == 0, out
    # no unterminated literal
    for a, b in spans:
        assert b <= len(out) and out[b - 1] in "'\"", out
