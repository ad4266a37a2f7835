"""Run the reference's own doc-function regression suites through the
engine (tools/ref_parity.py) and gate on the achieved pass floor.

The suites are the reference repo's golden SQL cases
(regression-test/suites/doc/sql-manual/sql-functions/*.groovy + .out);
they execute byte-for-byte through Engine.sql with only the MySQL
dialect translation any FE performs. Skipped when the reference checkout
is not present.

Known-unreachable remainder (6 cases, score 1477/1483): int128
LARGEINT-array cases whose values sit at +/-2^127 — above DECIMAL(38)'s
1e38-1 ceiling, so no Spark type can carry them exactly; backed by
DOUBLE, the distinctness/overflow-wrap goldens remain unrepresentable.
The former LMT/year-0 remainder (22 cases) is closed by the FE
tz-literal conversion retry in tools/ref_parity.py: Doris's FE converts
tz-suffixed datetime literals with the zone's MODERN offset (cctz
+08:00, not the tzdb LMT +08:05:43 the JVM renders) and its calendar
has a year 0 — mirrored by rewriting the literal to the converted local
form, and riding the exact 400-year Gregorian cycle (146097 days) when
results land in the Python-unrepresentable year 0 (inputs AND goldens
shift together; every calendar function commutes with the period).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

# Hour-scale replay tier: excluded from the default (driver/CI) run by
# pytest.ini's `-m "not slow"`; run with `-m ""` for the full battery.
pytestmark = pytest.mark.slow

REF = "/root/reference/regression-test/suites/doc/sql-manual/sql-functions"

# floor = last locked score minus a small flake budget
PASS_FLOOR = 1470
TOTAL_EXPECTED = 1483


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")
def test_reference_doc_suites_pass_floor(tmp_path):
    out = subprocess.run(
        [sys.executable, "tools/ref_parity.py"],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    first = (out.stdout or "").strip().splitlines()
    assert first, f"no output; stderr tail: {out.stderr[-500:]}"
    line = first[0]
    assert line.startswith("reference-parity:"), line
    passed, total = line.split(":")[1].strip().split()[0].split("/")
    assert int(total) == TOTAL_EXPECTED, line
    assert int(passed) >= PASS_FLOOR, line
