"""Run the reference's own doc-function regression suites through the
engine (tools/ref_parity.py) and gate on the achieved pass floor.

The suites are the reference repo's golden SQL cases
(regression-test/suites/doc/sql-manual/sql-functions/*.groovy + .out);
they execute byte-for-byte through Engine.sql with only the MySQL
dialect translation any FE performs. Skipped when the reference checkout
is not present.

Known-unreachable remainder (28 cases at the round-5 close, score
1455/1483): pre-1901 Asia/Shanghai LMT offsets (+08:05:43) on ancient
tz-suffixed timestamps and year-0 datetime results, neither of which can
materialize through PySpark's collect (Python datetime has no year 0 and
the JVM/tzdb render LMT), plus 6 int128 LARGEINT-array cases (values at
2^127 exceed every Spark numeric type; backed by DOUBLE, the
distinctness/overflow-wrap cases remain unrepresentable).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REF = "/root/reference/regression-test/suites/doc/sql-manual/sql-functions"

# floor = last locked score minus a small flake budget
PASS_FLOOR = 1440
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
