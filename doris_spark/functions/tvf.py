"""Generating table functions (Doris BuiltinTableGeneratingFunctions).

Reference: fe/fe-core/src/main/java/org/apache/doris/catalog/
BuiltinTableGeneratingFunctions.java (explode_json_array_*, explode_map,
explode_bitmap, explode_numbers, explode_split, json_each, ...), BE
impls under be/src/exprs/table_function/.

Spark's native explode/posexplode over arrays and maps is THE fast path
(whole-stage codegen; used by gen_tvf_family). These registrations make
the Doris names SQL-callable — `SELECT ... FROM t, LATERAL
explode_json_array_int(j)` — as Python UDTFs (Arrow-batched in the
executor worker; the reference runs them in a per-BE python server,
python_udtf_function.h).

Every function has an `_outer` variant that emits one NULL row instead
of zero rows for empty/invalid input (LATERAL VIEW OUTER semantics).
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


def _loads_array(j):
    if j is None:
        return None
    try:
        v = json.loads(j)
    except ValueError:
        return None
    return v if isinstance(v, list) else None


def _mk_json_array(name: str, ret: str, conv, outer: bool):
    class _U:
        def eval(self, j: str):
            arr = _loads_array(j)
            if not arr:
                if outer:
                    yield (None,)
                return
            for v in arr:
                yield (conv(v),)

    _U.__name__ = name
    return udtf(_U, returnType=ret)


def _to_int(v):
    try:
        return int(v) if not isinstance(v, bool) else None
    except (ValueError, TypeError):
        return None


def _to_double(v):
    try:
        return float(v) if not isinstance(v, bool) else None
    except (ValueError, TypeError):
        return None


def _to_string(v):
    if v is None:
        return None
    return v if isinstance(v, str) else json.dumps(v, separators=(",", ":"))


def _to_json(v):
    return json.dumps(v, separators=(",", ":"))


def register(spark: SparkSession) -> int:
    n = 0

    def reg(name, cls):
        nonlocal n
        spark.udtf.register(name, cls)
        n += 1

    for suffix, ret, conv in (
        ("int", "v: bigint", _to_int),
        ("double", "v: double", _to_double),
        ("string", "v: string", _to_string),
        ("json", "v: string", _to_json),
    ):
        reg(f"explode_json_array_{suffix}", _mk_json_array(f"EJA_{suffix}", ret, conv, False))
        reg(
            f"explode_json_array_{suffix}_outer",
            _mk_json_array(f"EJAO_{suffix}", ret, conv, True),
        )

    def _mk_json_object(outer: bool, text: bool):
        class _U:
            def eval(self, j: str):
                try:
                    v = json.loads(j) if j is not None else None
                except ValueError:
                    v = None
                if not isinstance(v, dict) or not v:
                    if outer:
                        yield None, None
                    return
                for k, val in v.items():
                    if text and isinstance(val, str):
                        yield k, val
                    else:
                        yield k, json.dumps(val, separators=(",", ":"))

        return udtf(_U, returnType="k: string, v: string")

    reg("explode_json_object", _mk_json_object(False, False))
    reg("explode_json_object_outer", _mk_json_object(True, False))
    # json_each / json_each_text (Postgres-style names in the reference's
    # TVF registry): key/value pairs; _text unquotes string values
    reg("json_each", _mk_json_object(False, False))
    reg("json_each_outer", _mk_json_object(True, False))
    reg("json_each_text", _mk_json_object(False, True))
    reg("json_each_text_outer", _mk_json_object(True, True))

    def _mk_split(outer: bool):
        class _U:
            def eval(self, s: str, sep: str):
                parts = s.split(sep) if s is not None and sep else None
                if not parts:
                    if outer:
                        yield (None,)
                    return
                for p in parts:
                    yield (p,)

        return udtf(_U, returnType="v: string")

    reg("explode_split", _mk_split(False))
    reg("explode_split_outer", _mk_split(True))

    def _mk_numbers(outer: bool):
        class _U:
            def eval(self, n_: int):
                if n_ is None or n_ <= 0:
                    if outer:
                        yield (None,)
                    return
                for i in range(int(n_)):
                    yield (i,)

        return udtf(_U, returnType="number: bigint")

    reg("explode_numbers", _mk_numbers(False))
    reg("explode_numbers_outer", _mk_numbers(True))

    def _mk_bitmap(outer: bool):
        class _U:
            def eval(self, b):
                if not b:
                    if outer:
                        yield (None,)
                    return
                for v in b:
                    yield (v,)

        return udtf(_U, returnType="v: bigint")

    reg("explode_bitmap", _mk_bitmap(False))
    reg("explode_bitmap_outer", _mk_bitmap(True))

    def _mk_map(outer: bool):
        class _U:
            def eval(self, m):
                if not m:
                    if outer:
                        yield None, None
                    return
                for k, v in m.items():
                    yield str(k), None if v is None else str(v)

        return udtf(_U, returnType="k: string, v: string")

    reg("explode_map", _mk_map(False))
    reg("explode_map_outer", _mk_map(True))

    def _mk_variant_array():
        class _U:
            def eval(self, j: str):
                arr = _loads_array(j)
                if not arr:
                    return
                for v in arr:
                    yield (json.dumps(v, separators=(",", ":")),)

        return udtf(_U, returnType="v: string")

    reg("explode_variant_array", _mk_variant_array())

    def _mk_unnest():
        class _U:
            def eval(self, arr):
                if not arr:
                    return
                for v in arr:
                    yield (v,)

        return udtf(_U, returnType="v: string")

    reg("unnest", _mk_unnest())

    return n
