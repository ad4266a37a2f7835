"""Property-based tests (hypothesis) for the pure-python kernels —
mirrors the reference's fuzz-style regression strategy (SURVEY §5) on
the components where we own the algorithm: WKT geometry, the geo
predicate kernel, and the SQL macro rewriter. Plus a fixed-seed batched
equivalence check of the SQL gcd/lcm fold against python math."""

from __future__ import annotations

import math
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from doris_spark.functions.geo2 import (
    Geom,
    contains,
    intersects,
    parse_wkt,
    to_wkt,
    touches,
)
from doris_spark.plans.sql_macros import MACROS, rewrite

coord = st.floats(
    min_value=-180, max_value=180, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 6))


@st.composite
def points(draw):
    return Geom("POINT", [(draw(coord), draw(coord))])


@st.composite
def linestrings(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    return Geom("LINESTRING", [(draw(coord), draw(coord)) for _ in range(n)])


@st.composite
def convex_polygons(draw):
    """Convex ring: random radii at sorted angles around a center."""
    cx, cy = draw(coord), draw(coord)
    n = draw(st.integers(min_value=3, max_value=8))
    angles = sorted(draw(st.floats(0, 2 * math.pi)) for _ in range(n))
    r = draw(st.floats(min_value=0.5, max_value=10))

    def mk(angs):
        ring = [
            (round(cx + r * math.cos(a), 6), round(cy + r * math.sin(a), 6))
            for a in angs
        ]
        ring.append(ring[0])
        return ring

    def area2(ring):
        return sum(
            ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
            for i in range(len(ring) - 1)
        )

    ring = mk(angles)
    # degenerate draws (coincident rounded vertices, collinear slivers)
    # are INVALID polygons — the engine, like the reference's S2 kernel,
    # answers NULL/False on them; swap in a regular n-gon instead
    if len({p for p in ring}) < 3 or abs(area2(ring)) < 1e-6:
        ring = mk([i * 2 * math.pi / n for i in range(n)])
    return Geom("POLYGON", [ring]), (cx, cy), r


@settings(max_examples=200, deadline=None)
@given(st.one_of(points(), linestrings()))
def test_wkt_roundtrip(g):
    g2 = parse_wkt(to_wkt(g))
    assert g2 is not None and g2.typ == g.typ
    assert g2.parts == [
        [(float(x), float(y)) for x, y in part] if isinstance(part, list) else part
        for part in g.parts
    ] or g2.parts == g.parts


@settings(max_examples=100, deadline=None)
@given(convex_polygons())
def test_convex_contains_center(poly_center_r):
    poly, (cx, cy), r = poly_center_r
    # centroid of the ring vertices is inside any convex polygon
    ring = poly.parts[0][:-1]
    mx = sum(p[0] for p in ring) / len(ring)
    my = sum(p[1] for p in ring) / len(ring)
    assert contains(poly, Geom("POINT", [(mx, my)])) is True
    # a point far outside the circumscribed radius is not contained
    far = Geom("POINT", [(cx + 3 * r + 1, cy)])
    assert contains(poly, far) is False
    assert intersects(poly, far) is False


@settings(max_examples=100, deadline=None)
@given(convex_polygons(), points())
def test_predicate_consistency(poly_center_r, p):
    poly, _, _ = poly_center_r
    inter = intersects(poly, p)
    # touches implies intersects; contains implies intersects
    if touches(poly, p):
        assert inter
    if contains(poly, p):
        assert inter
    # a point that intersects a polygon is inside or ON it; contains is
    # open-boundary (S2 semantics: boundary point => touches, not
    # contains), so intersects implies contains OR touches
    if inter:
        assert contains(poly, p) is True or touches(poly, p) is True


IDENT = st.from_regex(r"[a-z_][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s.lower() not in MACROS
)


@settings(max_examples=200, deadline=None)
@given(st.lists(IDENT, min_size=1, max_size=6), st.sampled_from(["x", "a + b", "'lit,eral'"]))
def test_rewrite_leaves_nonmacro_sql_alone(names, arg):
    sql = "SELECT " + ", ".join(f"{n}({arg})" for n in names) + " FROM t"
    assert rewrite(sql) == sql


@settings(max_examples=100, deadline=None)
@given(st.sampled_from(["ndv", "group_array", "variance_pop", "sum0"]), IDENT)
def test_rewrite_balanced_and_stable(macro, col):
    out = rewrite(f"SELECT {macro}({col}) FROM t")
    assert out.count("(") == out.count(")")
    # expansions of pure renames / simple templates are fixpoints
    assert rewrite(out) == out


def test_sql_gcd_lcm_vs_python(spark):
    rng = random.Random(7)
    pairs = [(rng.randint(-10**9, 10**9), rng.randint(-10**9, 10**9)) for _ in range(200)]
    pairs += [(0, 0), (0, 5), (5, 0), (1, 1), (2**62, 2**31)]
    values = ", ".join(f"({a}, {b})" for a, b in pairs)
    rows = spark.sql(
        f"SELECT a, b, gcd(a, b) g, lcm(a, b) l FROM VALUES {values} AS v(a, b)"
    ).collect()
    for r in rows:
        assert r["g"] == math.gcd(r["a"], r["b"]), (r["a"], r["b"], r["g"])
        if r["a"] != 0 and r["b"] != 0:
            expected = abs(r["a"] // math.gcd(r["a"], r["b"]) * r["b"])
            assert r["l"] == expected, (r["a"], r["b"], r["l"])


def test_civil_date_math_roundtrip_and_reference():
    """tools/ref_parity.py tz-literal retry math: Hinnant civil-date
    conversion with truncating division must round-trip across the
    year-0/negative era and agree with Python datetime where both exist."""
    import datetime as dt
    import importlib.util
    import sys

    sys.path.insert(0, "/root/repo")
    spec = importlib.util.spec_from_file_location("rp_math", "/root/repo/tools/ref_parity.py")
    # import only the pure helpers (module import is heavy) — exec the defs
    import re as _re

    src = open("/root/repo/tools/ref_parity.py").read()
    ns = {}
    for fn in ("_tdiv", "_days_from_civil", "_civil_from_days", "_off_secs"):
        m = _re.search(rf"def {fn}\(.*?(?=\n\ndef |\n\n\n)", src, _re.S)
        exec(m.group(0), ns)

    # agreement with Python datetime over a representable span
    epoch = dt.date(1970, 1, 1)
    for y, m, d in [(1, 1, 1), (4, 2, 29), (100, 3, 1), (400, 2, 29),
                    (1582, 10, 15), (1899, 12, 31), (1970, 1, 1),
                    (2024, 2, 29), (9999, 12, 31)]:
        want = (dt.date(y, m, d) - epoch).days
        assert ns["_days_from_civil"](y, m, d) == want, (y, m, d)

    # round-trip through the unrepresentable years (incl. year 0)
    for days in range(-719600, -719400):
        y, m, d = ns["_civil_from_days"](days)
        assert ns["_days_from_civil"](y, m, d) == days
    # year 0 is leap in the proleptic Gregorian ISO calendar
    assert ns["_civil_from_days"](ns["_days_from_civil"](0, 2, 29)) == (0, 2, 29)
    # offset parsing
    assert ns["_off_secs"]("Z") == 0
    assert ns["_off_secs"]("+08:00") == 8 * 3600
    assert ns["_off_secs"]("-05:00") == -5 * 3600
    assert ns["_off_secs"]("+0930") == 9 * 3600 + 30 * 60
