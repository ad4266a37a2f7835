"""Geo function family over a WKT-string geometry representation.

Reference: be/src/exprs/function/geo/ (geo.cpp, geo_types) — Doris keeps
geometries as an opaque binary type; we keep them as normalized WKT
STRINGs so they stay printable, hashable and oracle-comparable, with a
pure-python computational-geometry kernel behind Arrow-batched pandas
UDFs (no geo libraries in this container; Sedona would be the cluster
deployment choice and slots in behind the same names).

Kernel scope (documented honest limits):
- Geometry types: POINT, LINESTRING, POLYGON (with holes), MULTIPOINT,
  MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION, CIRCLE (Doris
  extension: "CIRCLE (x y, r_meters)").
- st_contains / st_intersects / st_disjoint: exact planar predicates via
  ray casting + segment intersection (polygon/linestring/point, any
  pair).
- st_touches: boundary contact without interior overlap (exact for
  point-vs-any and linestring/polygon boundary contact at shared
  vertices/edge crossings at endpoints).
- st_area_square_meters/_km: spherical excess on the 6371 km sphere
  (matches st_distance_sphere's sphere in functions/registry.py).
- st_length: spherical length of a linestring; st_distance: planar
  euclidean in degrees (the reference's planar variant).

The simple point accessors (st_point/st_x/st_y/st_astext over a struct)
predate this module in functions/registry.py and remain; st_aswkt and
the WKT constructors here accept both tiers (a struct point is rendered
to WKT by registry's st_astext).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

R_EARTH = 6371000.0

_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"


class Geom:
    """typ: POINT|LINESTRING|POLYGON|MULTI*|GEOMETRYCOLLECTION|CIRCLE.
    parts: POINT -> [(x, y)]; LINESTRING -> [pts]; POLYGON -> [rings];
    MULTI*/COLLECTION -> [Geom]; CIRCLE -> [(x, y)], radius set."""

    __slots__ = ("typ", "parts", "radius")

    def __init__(self, typ, parts, radius=None):
        self.typ = typ
        self.parts = parts
        self.radius = radius


def _fmt_num(v: float) -> str:
    # BE WKT rendering uses 15 significant digits
    # (geo_types.cpp:73 std::setprecision(15))
    return repr(int(v)) if float(v).is_integer() else f"{float(v):.15g}"


def _fmt_pts(pts) -> str:
    return ", ".join(f"{_fmt_num(x)} {_fmt_num(y)}" for x, y in pts)


def to_wkt(g: Geom) -> str:
    if g.typ == "POINT":
        return f"POINT ({_fmt_pts(g.parts)})"
    if g.typ == "LINESTRING":
        return f"LINESTRING ({_fmt_pts(g.parts)})"
    if g.typ == "POLYGON":
        rings = ", ".join(f"({_fmt_pts(r)})" for r in g.parts)
        return f"POLYGON ({rings})"
    if g.typ == "CIRCLE":
        (x, y) = g.parts[0]
        return f"CIRCLE ({_fmt_num(x)} {_fmt_num(y)}, {_fmt_num(g.radius)})"
    if g.typ in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
        if g.typ == "GEOMETRYCOLLECTION":
            inner = ", ".join(to_wkt(sub) for sub in g.parts)
        else:
            inner = ", ".join(to_wkt(sub)[to_wkt(sub).index("(") :] for sub in g.parts)
        return f"{g.typ} ({inner})"
    raise ValueError(g.typ)


def _parse_pts(body: str):
    pts = []
    for pair in body.split(","):
        nums = re.findall(_NUM, pair)
        if len(nums) != 2:
            raise ValueError(pair)
        pts.append((float(nums[0]), float(nums[1])))
    return pts


def _split_top(body: str):
    """Split on commas at paren depth 0."""
    out, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def parse_wkt(s: str) -> Geom | None:
    if s is None:
        return None
    s = s.strip()
    m = re.match(r"^([A-Za-z]+)\s*\((.*)\)\s*$", s, re.S)
    if not m:
        return None
    typ = m.group(1).upper()
    body = m.group(2).strip()
    try:
        if typ == "POINT":
            return Geom("POINT", _parse_pts(body))
        if typ == "LINESTRING":
            pts = _parse_pts(body)
            return Geom("LINESTRING", pts) if len(pts) >= 2 else None
        if typ == "POLYGON":
            rings = [_parse_pts(r.strip()[1:-1]) for r in _split_top(body)]
            for r in rings:
                if len(r) < 4 or r[0] != r[-1]:
                    return None
            return Geom("POLYGON", rings)
        if typ == "CIRCLE":
            nums = re.findall(_NUM, body)
            if len(nums) != 3:
                return None
            return Geom("CIRCLE", [(float(nums[0]), float(nums[1]))], float(nums[2]))
        if typ == "MULTIPOINT":
            pts = _parse_pts(body.replace("(", "").replace(")", ""))
            return Geom("MULTIPOINT", [Geom("POINT", [p]) for p in pts])
        if typ == "MULTILINESTRING":
            return Geom(
                "MULTILINESTRING",
                [Geom("LINESTRING", _parse_pts(p.strip()[1:-1])) for p in _split_top(body)],
            )
        if typ == "MULTIPOLYGON":
            subs = []
            for p in _split_top(body):
                p = p.strip()[1:-1]
                rings = [_parse_pts(r.strip()[1:-1]) for r in _split_top(p)]
                subs.append(Geom("POLYGON", rings))
            return Geom("MULTIPOLYGON", subs)
        if typ == "GEOMETRYCOLLECTION":
            return Geom("GEOMETRYCOLLECTION", [parse_wkt(p.strip()) for p in _split_top(body)])
    except (ValueError, IndexError):
        return None
    return None


# ---------------- planar predicates ----------------


def _on_segment(p, a, b, eps=1e-12) -> bool:
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if abs(cross) > eps * max(1.0, abs(b[0] - a[0]), abs(b[1] - a[1])):
        return False
    return (
        min(a[0], b[0]) - eps <= p[0] <= max(a[0], b[0]) + eps
        and min(a[1], b[1]) - eps <= p[1] <= max(a[1], b[1]) + eps
    )


def _seg_intersect(p1, p2, p3, p4) -> bool:
    def d(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    d1, d2 = d(p3, p4, p1), d(p3, p4, p2)
    d3, d4 = d(p1, p2, p3), d(p1, p2, p4)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    return (
        (d1 == 0 and _on_segment(p1, p3, p4))
        or (d2 == 0 and _on_segment(p2, p3, p4))
        or (d3 == 0 and _on_segment(p3, p1, p2))
        or (d4 == 0 and _on_segment(p4, p1, p2))
    )


def _point_in_ring(p, ring) -> int:
    """2 = interior, 1 = boundary, 0 = exterior (ray casting)."""
    inside = False
    n = len(ring) - 1
    for i in range(n):
        a, b = ring[i], ring[i + 1]
        if _on_segment(p, a, b):
            return 1
        if (a[1] > p[1]) != (b[1] > p[1]):
            xin = (b[0] - a[0]) * (p[1] - a[1]) / (b[1] - a[1]) + a[0]
            if p[0] < xin:
                inside = not inside
    return 2 if inside else 0


def _point_in_polygon(p, rings) -> int:
    loc = _point_in_ring(p, rings[0])
    if loc != 2:
        return loc
    for hole in rings[1:]:
        hl = _point_in_ring(p, hole)
        if hl == 1:
            return 1
        if hl == 2:
            return 0
    return 2


def _edges(g: Geom):
    if g.typ == "LINESTRING":
        pts = g.parts
        for i in range(len(pts) - 1):
            yield pts[i], pts[i + 1]
    elif g.typ == "POLYGON":
        for ring in g.parts:
            for i in range(len(ring) - 1):
                yield ring[i], ring[i + 1]


def _points_of(g: Geom):
    if g.typ == "POINT":
        return g.parts
    if g.typ == "LINESTRING":
        return g.parts
    if g.typ == "POLYGON":
        return [p for r in g.parts for p in r]
    return [p for sub in g.parts for p in _points_of(sub)]


def contains(a: Geom, b: Geom) -> bool | None:
    """a contains b: every point of b inside/boundary of a, interiors meet."""
    if a is None or b is None:
        return None
    if a.typ == "CIRCLE":
        (cx, cy), r = a.parts[0], a.radius
        return all(
            _sphere_dist(cx, cy, x, y) <= r for x, y in _points_of(b)
        )
    if a.typ != "POLYGON":
        if a.typ in ("MULTIPOLYGON", "GEOMETRYCOLLECTION"):
            return all(
                any(contains(sub, Geom("POINT", [p])) for sub in a.parts)
                for p in _points_of(b)
            )
        if a.typ == "POINT":
            return b.typ == "POINT" and a.parts[0] == b.parts[0]
        return None
    locs = [_point_in_polygon(p, a.parts) for p in _points_of(b)]
    if any(loc == 0 for loc in locs):
        return False
    # vertices all in/on: edges must not cross the boundary to outside
    for e1 in _edges(b):
        mid = ((e1[0][0] + e1[1][0]) / 2, (e1[0][1] + e1[1][1]) / 2)
        if _point_in_polygon(mid, a.parts) == 0:
            return False
    return any(loc == 2 for loc in locs) or b.typ != "POINT" or locs[0] >= 1


def intersects(a: Geom, b: Geom) -> bool | None:
    if a is None or b is None:
        return None
    for g1, g2 in ((a, b), (b, a)):
        if g1.typ in ("MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION"):
            return any(intersects(sub, g2) for sub in g1.parts)
    if a.typ == "POINT":
        return _point_touches(a.parts[0], b) is not False
    if b.typ == "POINT":
        return _point_touches(b.parts[0], a) is not False
    for e1 in _edges(a):
        for e2 in _edges(b):
            if _seg_intersect(e1[0], e1[1], e2[0], e2[1]):
                return True
    if a.typ == "POLYGON" and _point_in_polygon(_points_of(b)[0], a.parts) > 0:
        return True
    if b.typ == "POLYGON" and _point_in_polygon(_points_of(a)[0], b.parts) > 0:
        return True
    return False


def _point_touches(p, g: Geom):
    """True-ish classification of point vs geometry: 'interior',
    'boundary', or False."""
    if g.typ == "POINT":
        return "boundary" if p == g.parts[0] else False
    if g.typ == "LINESTRING":
        return "interior" if any(_on_segment(p, a, b) for a, b in _edges(g)) else False
    if g.typ == "POLYGON":
        loc = _point_in_polygon(p, g.parts)
        return "interior" if loc == 2 else ("boundary" if loc == 1 else False)
    if g.typ == "CIRCLE":
        (cx, cy), r = g.parts[0], g.radius
        d = _sphere_dist(cx, cy, p[0], p[1])
        return "interior" if d < r else ("boundary" if abs(d - r) < 1e-6 else False)
    return any(_point_touches(p, sub) for sub in g.parts) and "interior"


def touches(a: Geom, b: Geom) -> bool | None:
    """Boundary contact without interior-interior intersection."""
    if a is None or b is None:
        return None
    if a.typ == "POINT" and b.typ == "POINT":
        return False
    if a.typ == "POINT":
        return _point_touches(a.parts[0], b) == "boundary"
    if b.typ == "POINT":
        return _point_touches(b.parts[0], a) == "boundary"
    if not intersects(a, b):
        return False
    if a.typ == "POLYGON" and b.typ == "POLYGON":
        # interiors disjoint <=> no vertex strictly inside the other and
        # no proper edge crossing (shared edges allowed)
        if any(_point_in_polygon(p, b.parts) == 2 for p in _points_of(a)):
            return False
        if any(_point_in_polygon(p, a.parts) == 2 for p in _points_of(b)):
            return False
        for e1 in _edges(a):
            mid = ((e1[0][0] + e1[1][0]) / 2, (e1[0][1] + e1[1][1]) / 2)
            if _point_in_polygon(mid, b.parts) == 2:
                return False
        return True
    return True  # line/polygon contact that intersects but via boundary


# ---------------- spherical measures ----------------


def _sphere_dist(lon1, lat1, lon2, lat2) -> float:
    la1, la2 = math.radians(lat1), math.radians(lat2)
    dla = la2 - la1
    dlo = math.radians(lon2 - lon1)
    h = math.sin(dla / 2) ** 2 + math.cos(la1) * math.cos(la2) * math.sin(dlo / 2) ** 2
    return 2 * R_EARTH * math.asin(math.sqrt(h))


def _ring_area_sphere(ring) -> float:
    """Spherical excess (l'Huilier / Girard via the shoelace on the unit
    sphere), absolute value, in m^2."""
    total = 0.0
    n = len(ring) - 1
    for i in range(n):
        lon1, lat1 = ring[i]
        lon2, lat2 = ring[(i + 1) % n]
        total += math.radians(lon2 - lon1) * (
            2 + math.sin(math.radians(lat1)) + math.sin(math.radians(lat2))
        )
    return abs(total) * R_EARTH * R_EARTH / 2


def area_m2(g: Geom) -> float | None:
    if g is None:
        return None
    if g.typ == "POLYGON":
        a = _ring_area_sphere(g.parts[0])
        for hole in g.parts[1:]:
            a -= _ring_area_sphere(hole)
        return a
    if g.typ == "CIRCLE":
        return math.pi * g.radius * g.radius
    if g.typ == "MULTIPOLYGON":
        return sum(area_m2(sub) for sub in g.parts)
    return 0.0


def length_m(g: Geom) -> float | None:
    if g is None:
        return None
    if g.typ == "LINESTRING":
        return sum(_sphere_dist(a[0], a[1], b[0], b[1]) for a, b in _edges(g))
    if g.typ == "MULTILINESTRING":
        return sum(length_m(sub) for sub in g.parts)
    return 0.0


def npoints(g: Geom) -> int | None:
    if g is None:
        return None
    if g.typ == "POLYGON":
        return sum(len(r) - 1 for r in g.parts)
    return len(_points_of(g))


def _angle_at(p1, p2, p3) -> float:
    """Angle at p2 between rays p2->p1 and p2->p3, radians [0, pi]."""
    v1 = (p1[0] - p2[0], p1[1] - p2[1])
    v2 = (p3[0] - p2[0], p3[1] - p2[1])
    n1 = math.hypot(*v1)
    n2 = math.hypot(*v2)
    if n1 == 0 or n2 == 0:
        return float("nan")
    c = max(-1.0, min(1.0, (v1[0] * v2[0] + v1[1] * v2[1]) / (n1 * n2)))
    return math.acos(c)


def _azimuth(p1, p2) -> float | None:
    """Azimuth from p1 to p2, radians clockwise from north (PostGIS/Doris
    convention, st_azimuth in geo.cpp)."""
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    if dx == 0 and dy == 0:
        return None
    return math.atan2(dx, dy) % (2 * math.pi)


# ---------------- registration ----------------


def register(spark: SparkSession) -> int:
    n = 0

    def reg(name, fn, ret):
        nonlocal n
        spark.udf.register(name, pandas_udf(fn, ret))
        n += 1

    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: to_wkt(parse_wkt(v)) if parse_wkt(v) else None)

    for nm in (
        "st_geometryfromtext",
        "st_geomfromtext",
        "st_linefromtext",
        "st_linestringfromtext",
        "st_polygonfromtext",
        "st_polyfromtext",
        "st_polygon",
        "st_aswkt_text",
    ):
        reg(nm, _norm, "string")

    def st_geometrytype(s: pd.Series) -> pd.Series:
        def f(v):
            g = parse_wkt(v)
            return "ST_" + g.typ.capitalize() if g else None

        return s.map(f)

    reg("st_geometrytype", st_geometrytype, "string")

    def st_npoints(s: pd.Series) -> pd.Series:
        return s.map(lambda v: npoints(parse_wkt(v)))

    reg("st_numpoints", st_npoints, "int")
    reg("st_npoints", st_npoints, "int")

    def st_numgeometries(s: pd.Series) -> pd.Series:
        def f(v):
            g = parse_wkt(v)
            if g is None:
                return None
            return len(g.parts) if g.typ.startswith(("MULTI", "GEOMETRY")) else 1

        return s.map(f)

    reg("st_numgeometries", st_numgeometries, "int")

    def st_geometries(s: pd.Series) -> pd.Series:
        def f(v):
            g = parse_wkt(v)
            if g is None:
                return None
            if g.typ.startswith(("MULTI", "GEOMETRY")):
                return [to_wkt(sub) for sub in g.parts]
            return [to_wkt(g)]

        return s.map(f)

    reg("st_geometries", st_geometries, "array<string>")

    def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([contains(parse_wkt(x), parse_wkt(y)) for x, y in zip(a, b)])

    reg("st_contains", st_contains, "boolean")

    def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([intersects(parse_wkt(x), parse_wkt(y)) for x, y in zip(a, b)])

    reg("st_intersects", st_intersects, "boolean")

    def st_disjoint(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(a, b):
            i = intersects(parse_wkt(x), parse_wkt(y))
            out.append(None if i is None else not i)
        return pd.Series(out)

    reg("st_disjoint", st_disjoint, "boolean")

    def st_touches(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([touches(parse_wkt(x), parse_wkt(y)) for x, y in zip(a, b)])

    reg("st_touches", st_touches, "boolean")

    def st_area_m2(s: pd.Series) -> pd.Series:
        return s.map(lambda v: area_m2(parse_wkt(v)))

    reg("st_area_square_meters", st_area_m2, "double")

    def st_area_km2(s: pd.Series) -> pd.Series:
        def f(v):
            a = area_m2(parse_wkt(v))
            return None if a is None else a / 1e6

        return s.map(f)

    reg("st_area_square_km", st_area_km2, "double")

    def st_length(s: pd.Series) -> pd.Series:
        return s.map(lambda v: length_m(parse_wkt(v)))

    reg("st_length", st_length, "double")

    def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        def f(x, y):
            g1, g2 = parse_wkt(x), parse_wkt(y)
            if g1 is None or g2 is None or g1.typ != "POINT" or g2.typ != "POINT":
                return None
            (x1, y1), (x2, y2) = g1.parts[0], g2.parts[0]
            return math.hypot(x2 - x1, y2 - y1)

        return pd.Series([f(x, y) for x, y in zip(a, b)])

    reg("st_distance", st_distance, "double")

    def st_angle(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
        def f(x, y, z):
            g1, g2, g3 = parse_wkt(x), parse_wkt(y), parse_wkt(z)
            if any(g is None or g.typ != "POINT" for g in (g1, g2, g3)):
                return None
            v = _angle_at(g1.parts[0], g2.parts[0], g3.parts[0])
            return None if math.isnan(v) else v

        return pd.Series([f(x, y, z) for x, y, z in zip(a, b, c)])

    reg("st_angle", st_angle, "double")

    def st_azimuth(a: pd.Series, b: pd.Series) -> pd.Series:
        def f(x, y):
            g1, g2 = parse_wkt(x), parse_wkt(y)
            if g1 is None or g2 is None or g1.typ != "POINT" or g2.typ != "POINT":
                return None
            return _azimuth(g1.parts[0], g2.parts[0])

        return pd.Series([f(x, y) for x, y in zip(a, b)])

    reg("st_azimuth", st_azimuth, "double")

    def st_circle(x: pd.Series, y: pd.Series, r: pd.Series) -> pd.Series:
        return pd.Series(
            [
                to_wkt(Geom("CIRCLE", [(float(a), float(b))], float(c)))
                if a is not None and b is not None and c is not None
                else None
                for a, b, c in zip(x, y, r)
            ]
        )

    reg("st_circle", st_circle, "string")

    def st_geometryfromwkb(s: pd.Series) -> pd.Series:
        # WKB little-endian point decode only (the reference's common use);
        # other types -> NULL
        def f(v):
            try:
                raw = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
                if len(raw) == 21 and raw[0] == 1 and raw[1:5] == b"\x01\x00\x00\x00":
                    import struct

                    x, y = struct.unpack("<dd", raw[5:21])
                    return to_wkt(Geom("POINT", [(x, y)]))
            except (ValueError, TypeError):
                pass
            return None

        return s.map(f)

    reg("st_geometryfromwkb", st_geometryfromwkb, "string")

    # st_aswkt over the struct-point tier (registry.py st_point)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION st_aswkt(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURN "
        "'POINT (' || CAST(p.x AS STRING) || ' ' || CAST(p.y AS STRING) || ')'"
    )
    n += 1
    return n


def register_helpers(spark: SparkSession) -> int:
    """Helpers the registry's SQL-UDF bodies reference at CREATE time."""

    def _wkt_num(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else _fmt_num(v))

    spark.udf.register("__wkt_num", pandas_udf(_wkt_num, "string"))
    return 1
