"""WKT geo family (functions/geo2.py): pinned predicate/measure values."""

from __future__ import annotations

import math

import pytest

SQ = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))'"
HOLE = "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))'"

CASES = [
    (f"st_contains({SQ}, 'POINT (5 5)')", True),
    (f"st_contains({SQ}, 'POINT (15 5)')", False),
    (f"st_contains({SQ}, 'POINT (10 5)')", False),
    (f"st_contains({HOLE}, 'POINT (5 5)')", False),
    (f"st_contains({SQ}, 'LINESTRING (1 1, 9 9)')", True),
    (f"st_contains({SQ}, 'LINESTRING (1 1, 19 9)')", False),
    (f"st_intersects({SQ}, 'LINESTRING (-5 5, 15 5)')", True),
    (f"st_intersects({SQ}, 'LINESTRING (-5 -5, -1 -1)')", False),
    (f"st_disjoint({SQ}, 'POINT (15 15)')", True),
    (f"st_touches({SQ}, 'POLYGON ((10 0, 20 0, 20 10, 10 10, 10 0))')", True),
    (f"st_touches({SQ}, 'POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))')", False),
    (f"st_touches({SQ}, 'POINT (10 5)')", True),
    (f"st_touches({SQ}, 'POINT (5 5)')", False),
    ("st_geometrytype('POINT (1 2)')", "ST_POINT"),
    ("st_geometrytype('LINESTRING (0 0, 1 1)')", "ST_LINESTRING"),
    ("st_numpoints('LINESTRING (0 0, 1 1, 2 2)')", 3),
    (f"st_numpoints({SQ})", 5),
    ("st_numgeometries('MULTIPOINT ((1 1), (2 2))')", 2),
    ("st_geometries('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))')[0]", "POINT (1 1)"),
    ("st_geomfromtext('point( 1.5  2 )')", "POINT (1.5 2)"),
    ("st_geomfromtext('not wkt')", None),
    ("st_polygonfromtext('POLYGON ((0 0, 1 0, 1 1, 0 0))')", "POLYGON ((0 0, 1 0, 1 1, 0 0))"),
    ("round(st_distance('POINT (0 0)', 'POINT (3 4)'), 3)", 555812.814),
    ("round(st_angle('POINT (1 0)', 'POINT (0 0)', 'POINT (0 1)'), 6)", round(3 * math.pi / 2, 6)),
    ("round(st_azimuth('POINT (0 0)', 'POINT (1 0)'), 6)", round(math.pi / 2, 6)),
    ("round(st_azimuth('POINT (0 0)', 'POINT (0 1)'), 6)", 0.0),
    ("st_circle(5.0, 6.0, 100.0)", "CIRCLE ((5 6), 100)"),
    ("st_contains(st_circle(0.0, 0.0, 200000.0), 'POINT (1 1)')", True),
    ("st_contains(st_circle(0.0, 0.0, 100000.0), 'POINT (1 1)')", False),
    ("st_length('LINESTRING (0 0, 0 0)')", 0.0),
    ("st_aswkt(st_point(2.5, 3.5))", "POINT (2.5 3.5)"),
]


@pytest.mark.parametrize("call,expected", CASES, ids=[c[0][:70] for c in CASES])
def test_geo2_pinned(spark, call, expected):
    got = spark.sql("SELECT " + call).collect()[0][0]
    if isinstance(expected, float):
        assert got is not None and abs(got - expected) < 1e-6, (call, got, expected)
    elif isinstance(expected, int) and not isinstance(expected, bool):
        assert int(got) == expected, (call, got, expected)
    else:
        assert got == expected, (call, got, expected)


def test_geo2_area_sphere(spark):
    # 0.001-degree square at the equator ≈ (0.001 rad-deg arc)² on the
    # 6371 km sphere
    a = spark.sql(
        "SELECT st_area_square_meters('POLYGON ((0 0, 0.001 0, 0.001 0.001, 0 0.001, 0 0))')"
    ).collect()[0][0]
    exp = (0.001 * math.pi / 180 * 6371000) ** 2
    assert abs(a - exp) / exp < 0.01

    km2 = spark.sql(
        "SELECT st_area_square_km('POLYGON ((0 0, 0.001 0, 0.001 0.001, 0 0.001, 0 0))')"
    ).collect()[0][0]
    assert abs(km2 - a / 1e6) < 1e-9


def test_geo2_length_sphere(spark):
    # one degree of longitude at the equator
    got = spark.sql("SELECT st_length('LINESTRING (0 0, 1 0)')").collect()[0][0]
    assert abs(got - 6371000 * math.pi / 180) < 1000
