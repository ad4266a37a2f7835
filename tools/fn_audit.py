"""Function-name coverage audit against the reference FE registries.

Extracts every registered name from BuiltinScalarFunctions /
BuiltinAggregateFunctions / BuiltinTableGeneratingFunctions /
BuiltinWindowFunctions (fe/fe-core/.../catalog/) and diffs it against
this engine's SQL-callable surface: Spark builtins + every tier
registered by doris_spark.functions.register_all + the Engine.sql macro
layer + declared non-goals. Run: python tools/fn_audit.py
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

REF = "/root/reference/fe/fe-core/src/main/java/org/apache/doris/catalog/"

# Names resolved by the Engine.sql macro layer rather than a session
# registration.
# Names implemented as DataFrame-level operators / driver queries rather
# than session-registered SQL functions (COVERAGE.md maps each):
# funnel/sequence analytics (operators/funnel.py), orthogonal bitmap and
# topn/histogram aggregates, search()/score() (operators/search_dsl.py,
# txt_bm25), per-key map aggregates.
OPERATOR_LEVEL = {
    "window_funnel", "window_funnel_v1", "window_funnel_v2", "sequence_match",
    "sequence_count", "count_by_enum", "exponential_moving_average",
    "group_array_intersect", "orthogonal_bitmap_expr_calculate",
    "orthogonal_bitmap_expr_calculate_count", "orthogonal_bitmap_intersect",
    "orthogonal_bitmap_intersect_count", "orthogonal_bitmap_union_count",
    "histogram", "bitmap_intersect", "intersect_count",
    "score", "search", "multi_match",
}

# Declared non-goals (COVERAGE.md rationale per name): sm3/sm4 national
# crypto, ES passthrough, dictionary-encode perf internals, parser
# artifacts, XXH3 (no ported kernel).
NON_GOALS = {
    "sm3", "sm3sum", "sm4_decrypt", "sm4_encrypt", "aes_decrypt", "aes_encrypt",
    "esquery", "encode_as_bigint", "encode_as_int",
    "encode_as_largeint", "encode_as_smallint", "decode_as_varchar",
    "auto_partition_name", "interval", "g", "xxhash3_64",
    # TVF non-goals: binlog/CDC covered by the streaming-source note in
    # COVERAGE §2.11; hudi_meta needs the Hudi connector absent here
    "binlog", "cdc_stream", "hudi_meta",
}

# Table-valued functions are python APIs in sources/tvfs.py (plus the
# streaming-ingest surface for group_commit/http_stream); numbers() is
# also SQL-callable via explode_numbers.
TVF_MODULE = {
    "numbers", "file", "local", "s3", "hdfs", "http", "http_stream",
    "parquet_meta", "parquet_file_metadata", "parquet_kv_metadata",
    "parquet_bloom_probe", "catalogs", "partitions", "partition_values",
    "jobs", "tasks", "backends", "frontends", "frontends_disks",
    "mv_infos", "query", "group_commit",
}


def ref_names(fname: str) -> set[str]:
    src = open(REF + fname).read()
    out: set[str] = set()
    for m in re.finditer(
        r"(?:scalar|agg|tableGenerating|tableValued|window)\(\s*([A-Za-z0-9_]+)\.class(.*?)\)",
        src,
        re.S,
    ):
        names = re.findall(r'"([a-z0-9_]+)"', m.group(2))
        if names:
            out.update(names)
        else:
            out.add(re.sub(r"(?<!^)(?=[A-Z])", "_", m.group(1)).lower())
    return out


def main() -> None:
    from doris_spark.plans.sql_macros import MACROS
    from doris_spark.session import get_spark

    spark = get_spark("fn_audit")
    spark.sparkContext.setLogLevel("ERROR")
    have = {r[0].split(".")[-1].lower() for r in spark.sql("SHOW ALL FUNCTIONS").collect()}
    have |= {k.lower() for k in MACROS}
    report = {}
    for cat, fname in (
        ("scalar", "BuiltinScalarFunctions.java"),
        ("agg", "BuiltinAggregateFunctions.java"),
        ("generating", "BuiltinTableGeneratingFunctions.java"),
        ("window", "BuiltinWindowFunctions.java"),
        ("tvf", "BuiltinTableValuedFunctions.java"),
    ):
        ref = ref_names(fname)
        covered_extra = OPERATOR_LEVEL | (TVF_MODULE if cat == "tvf" else set())
        missing = sorted(
            n for n in ref if n not in have and n not in NON_GOALS and n not in covered_extra
        )
        declared = sorted(n for n in ref if n in NON_GOALS)
        op_level = sorted(n for n in ref if n in covered_extra)
        report[cat] = {
            "total": len(ref),
            "sql_callable": len(ref) - len(missing) - len(declared) - len(op_level),
            "operator_level": len(op_level),
            "non_goal": len(declared),
            "missing": missing,
        }
        print(
            f"{cat}: {report[cat]['sql_callable']}/{len(ref)} SQL-callable, "
            f"{len(op_level)} operator-level, {len(declared)} non-goals, "
            f"{len(missing)} missing"
        )
        if missing:
            print("  missing:", ", ".join(missing))
    json.dump(report, open("/tmp/fn_audit.json", "w"), indent=1)


if __name__ == "__main__":
    main()
