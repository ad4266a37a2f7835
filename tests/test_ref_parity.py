"""Run the reference's own doc-function regression suites through the
engine (tools/ref_parity.py) and gate on the achieved pass floor.

The suites are the reference repo's golden SQL cases
(regression-test/suites/doc/sql-manual/sql-functions/*.groovy + .out);
they execute byte-for-byte through Engine.sql with only the MySQL
dialect translation any FE performs. Skipped when the reference checkout
is not present.

Known-unreachable remainder (not counted against the floor): year-0
dates (below Spark/Python's proleptic minimum), TIME-typed casts
(declared shim), pre-1900 LMT zone offsets on ancient timestamps, and
timezone-suffixed month arithmetic.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REF = "/root/reference/regression-test/suites/doc/sql-manual/sql-functions"

# floor = last locked score minus a small flake budget
PASS_FLOOR = 1400
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
