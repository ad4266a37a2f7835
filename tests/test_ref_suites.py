"""Gate: the reference's own `correctness` regression-test directory
runs through the generic suite runner (tools/ref_suite_runner.py) with
its setup DDL/DML replayed and every qt_ golden compared.

Floor 225/232: the known remainder is the max_by NaN tie-break
(unspecified ordering between equal keys). correctness_p0 runs in the
same harness (tools, ~10 min) and is tracked in NOTES.md, not gated
here to keep the pytest wall-clock bounded.
"""

import json
import subprocess
import sys


def test_correctness_suite_floor():
    proc = subprocess.run(
        [sys.executable, "tools/ref_suite_runner.py", "correctness"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = next(
        (
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("suite-runner:")
        ),
        None,
    )
    assert line is not None, proc.stdout[-2000:] + proc.stderr[-2000:]
    res = json.load(open("/tmp/ref_suites.json"))
    assert res["total"] >= 230, line
    assert res["passed"] >= 225, line + "\n" + json.dumps(
        res["failures"][:10], indent=1
    )
