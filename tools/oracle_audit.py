"""Full driver-mirror audit: run every registered query and its DuckDB
oracle at a given SF, diff canonicalized values, and flag result columns
whose Spark type is complex (array/map/struct) — the driver's hasher
cannot handle those even when our local canonicalizer can.

Usage: python tools/oracle_audit.py [sf_dir] [query ...]
"""
from __future__ import annotations

import json
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_utils import compare, duckdb_conn  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from doris_spark.session import get_spark

    spark = get_spark()
    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb_conn(sf_dir)

    results = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {"ok": None, "complex_cols": [], "sec": None, "msg": ""}
        try:
            df = fn(spark, sf_dir)
            rec["complex_cols"] = [
                f.name
                for f in df.schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if name in osql:
                ok, msg = compare(df, con, osql[name])
                rec["ok"], rec["msg"] = ok, msg
            else:
                rec["ok"], rec["msg"] = True, f"rows-only: {df.count()}"
        except Exception as e:  # noqa: BLE001
            rec["ok"] = False
            rec["msg"] = "".join(traceback.format_exception_only(e)).strip()[:300]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        flag = "OK " if rec["ok"] else "FAIL"
        cc = f" COMPLEX={rec['complex_cols']}" if rec["complex_cols"] else ""
        print(f"{flag} {name} ({rec['sec']}s){cc}", flush=True)
        if not rec["ok"]:
            print("     " + rec["msg"][:500].replace("\n", "\n     "), flush=True)

    bad = {k for k, v in results.items() if not v["ok"]}
    cplx = {k: v["complex_cols"] for k, v in results.items() if v["complex_cols"]}
    print(json.dumps({"n": len(results), "fail": sorted(bad), "complex": cplx}))
    with open("/tmp/oracle_audit.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
