"""Count Spark jobs (and wall time) per registered query on a hot session.

Usage: python tools/jobcount.py [--sf DIR] [names...]
Writes /tmp/jobcount.json: {name: {"sec": s, "jobs": n, "stages": n}}.
Job/stage counts come from the status tracker via per-query job groups.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doris_spark import queries as Q
from doris_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    Q.load_all()
    if not names:
        names = sorted(Q.QUERIES)
    spark = get_spark("jobcount")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    Q.QUERIES["tpch_q1"](spark, sf_dir).collect()
    from pyspark.sql import functions as _F

    _noop = _F.pandas_udf(lambda s: s, "long")
    spark.range(32).select(_noop("id")).collect()

    out: dict[str, dict] = {}
    tracker = sc.statusTracker()
    for name in names:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        try:
            Q.QUERIES[name](spark, sf_dir).collect()
            sec = round(time.perf_counter() - t0, 3)
            job_ids = tracker.getJobIdsForGroup(name)
            stages = 0
            for j in job_ids:
                info = tracker.getJobInfo(j)
                if info is not None:
                    stages += len(info.stageIds)
            out[name] = {"sec": sec, "jobs": len(job_ids), "stages": stages}
        except Exception as exc:
            out[name] = {"sec": -1, "jobs": -1, "stages": -1,
                         "err": type(exc).__name__}
        finally:
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
    with open("/tmp/jobcount.json", "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)
    top = sorted(out.items(), key=lambda kv: -kv[1]["jobs"])[:40]
    for n, d in top:
        print(f"{d['jobs']:4d} jobs {d['stages']:4d} stages {d['sec']:8.3f}s  {n}")


if __name__ == "__main__":
    main()
