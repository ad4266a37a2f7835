"""JSON mutation functions: json_insert / json_replace / json_set /
json_remove.

Reference: the jsonb mutation family in
be/src/exprs/function/function_jsonb.cpp (json_insert/replace/set/remove,
MySQL-compatible semantics). Spark has no built-in JSON mutation, so these
are Arrow-batched pandas UDFs (the sanctioned Python path — one
python->JVM round trip per batch, not per row) over the stdlib json
module.

Paths are the JSONPath subset Doris accepts: `$.key`, `$.a.b`,
`$.arr[2]`, and combinations. The new value is passed as JSON text
(e.g. `'5'`, `'"x"'`, `'[1,2]'`) — the typed-UDF rendering of the
ANY-typed Doris argument. Output is compact-serialized
(`separators=(",", ":")`), which is also what Doris's jsonb printer
emits. Invalid document / path / value → NULL (Doris error-to-null
convention for the _parse_error_to_null family).

MySQL-compatible edge semantics (verified against the reference's
regression expectations):
- a path whose *parent* does not exist is ignored (document returned
  unchanged) — no implicit intermediate creation;
- array index beyond the end: `insert`/`set` append, `replace` ignores;
- `insert` never overwrites, `replace` never creates, `set` does both.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_SEG = re.compile(r"\.([A-Za-z0-9_ ]+)|\[(\d+)\]")


def _segments(path: str):
    """'$.a.b[2]' -> ['a', 'b', 2]; None if the path is malformed."""
    if not path or not path.startswith("$"):
        return None
    segs: list = []
    pos = 1
    for m in _SEG.finditer(path, 1):
        if m.start() != pos:
            return None
        segs.append(m.group(1) if m.group(1) is not None else int(m.group(2)))
        pos = m.end()
    if pos != len(path) or not segs:
        return None
    return segs


def _dump(doc) -> str:
    return json.dumps(doc, separators=(",", ":"))


def _mutate(doc_text, path, val_text, mode: str):
    if doc_text is None or path is None:
        return None
    segs = _segments(path)
    if segs is None:
        return None
    try:
        doc = json.loads(doc_text)
        val = json.loads(val_text) if val_text is not None else None
    except ValueError:
        return None
    cur = doc
    for s in segs[:-1]:
        if isinstance(s, int):
            if not isinstance(cur, list) or s >= len(cur):
                return _dump(doc)
            cur = cur[s]
        else:
            if not isinstance(cur, dict) or s not in cur:
                return _dump(doc)
            cur = cur[s]
    last = segs[-1]
    if isinstance(last, int):
        if not isinstance(cur, list):
            return _dump(doc)
        exists = last < len(cur)
        if mode == "remove":
            if exists:
                del cur[last]
        elif exists and mode in ("replace", "set"):
            cur[last] = val
        elif not exists and mode in ("insert", "set"):
            cur.append(val)
    else:
        if not isinstance(cur, dict):
            return _dump(doc)
        exists = last in cur
        if mode == "remove":
            cur.pop(last, None)
        elif exists and mode in ("replace", "set"):
            cur[last] = val
        elif not exists and mode in ("insert", "set"):
            cur[last] = val
    return _dump(doc)


def _make3(mode: str):
    @pandas_udf(StringType())
    def fn(j: pd.Series, p: pd.Series, v: pd.Series) -> pd.Series:
        return pd.Series(
            [_mutate(a, b, c, mode) for a, b, c in zip(j, p, v)], dtype=object
        )

    return fn


@pandas_udf(StringType())
def _json_remove(j: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series(
        [_mutate(a, b, None, "remove") for a, b in zip(j, p)], dtype=object
    )


def register(spark: SparkSession) -> int:
    """Register the four mutation functions; returns the count."""
    spark.udf.register("json_insert", _make3("insert"))
    spark.udf.register("json_replace", _make3("replace"))
    spark.udf.register("json_set", _make3("set"))
    spark.udf.register("json_remove", _json_remove)
    return 4
