"""Time a subset of registered queries on a hot session.

Usage: python tools/qtime.py q1 q2 ... [--passes N] [--sf DIR] [--explain]

Prints per-query seconds (min over passes) — the same methodology as
bench.py but restricted to the named queries, for fast optimization
iteration. --explain additionally writes plans/r11/<name>_current.txt.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doris_spark import queries as Q
from doris_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    passes = 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--passes":
            passes = int(args[i + 1]); i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--explain":
            explain = True; i += 1
        else:
            names.append(a); i += 1
    Q.load_all()
    unknown = [n for n in names if n not in Q.QUERIES]
    if unknown:
        print("unknown:", unknown); sys.exit(1)
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    Q.QUERIES["tpch_q1"](spark, sf_dir).collect()
    import pandas as _pd  # noqa: F401
    from pyspark.sql import functions as _F

    _noop = _F.pandas_udf(lambda s: s, "long")
    spark.range(32).select(_noop("id")).collect()
    best: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).collect()
            sec = round(time.perf_counter() - t0, 3)
            best[name] = min(best.get(name, 1e9), sec)
            spark.catalog.clearCache()
    for name in names:
        print(f"{best[name]:8.3f}  {name}")
    if explain:
        outdir = os.environ.get("QTIME_PLANS_DIR", "plans/r12")
        suffix = os.environ.get("QTIME_PLANS_SUFFIX", "_current")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = Q.QUERIES[name](spark, sf_dir)
            with open(f"{outdir}/{name}{suffix}.txt", "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
