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


# ---- search / reshape family (function_jsonb.cpp: json_search,
#      sort_json_object_keys, json_object_flatten) -----------------------


def _like_to_re(pattern: str):
    """MySQL LIKE pattern (% _, \\ escape) -> compiled regex."""
    out, i = [], 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("^" + "".join(out) + "$", re.DOTALL)


def _search(doc_text, one_or_all, pattern):
    """json_search: path(s) whose STRING value matches the LIKE pattern.
    Returns a JSON-quoted path, a JSON array of paths (mode 'all'), or
    NULL (MySQL semantics)."""
    if doc_text is None or one_or_all is None or pattern is None:
        return None
    mode = one_or_all.lower()
    if mode not in ("one", "all"):
        return None
    try:
        doc = json.loads(doc_text)
    except ValueError:
        return None
    rx = _like_to_re(pattern)
    hits: list[str] = []

    def walk(node, path):
        if isinstance(node, str):
            if rx.match(node):
                hits.append(path)
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}")
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{path}[{i}]")

    walk(doc, "$")
    if not hits:
        return None
    if mode == "one":
        return json.dumps(hits[0])
    return json.dumps(hits if len(hits) > 1 else hits[0], separators=(",", ":"))


def _sort_keys(doc_text):
    if doc_text is None:
        return None
    try:
        doc = json.loads(doc_text)
    except ValueError:
        return None
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


def _flatten(doc_text):
    """json_object_flatten: {'a': {'b': 1}, 'c': [2]} -> {'a.b': 1, 'c': [2]}
    (nested OBJECTS flatten to dotted keys; arrays stay values)."""
    if doc_text is None:
        return None
    try:
        doc = json.loads(doc_text)
    except ValueError:
        return None
    if not isinstance(doc, dict):
        return _dump(doc)
    flat: dict = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict) and v:
                walk(v, key)
            else:
                flat[key] = v

    walk(doc, "")
    return _dump(flat)


@pandas_udf(StringType())
def _json_search(j: pd.Series, m: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series([_search(a, b, c) for a, b, c in zip(j, m, p)], dtype=object)


@pandas_udf(StringType())
def _sort_json_object_keys(j: pd.Series) -> pd.Series:
    return pd.Series([_sort_keys(a) for a in j], dtype=object)


@pandas_udf(StringType())
def _json_object_flatten(j: pd.Series) -> pd.Series:
    return pd.Series([_flatten(a) for a in j], dtype=object)


def register(spark: SparkSession) -> int:
    """Register the jsonb mutation/search/reshape functions."""
    spark.udf.register("json_insert", _make3("insert"))
    spark.udf.register("json_replace", _make3("replace"))
    spark.udf.register("json_set", _make3("set"))
    spark.udf.register("json_remove", _json_remove)
    spark.udf.register("json_search", _json_search)
    spark.udf.register("sort_json_object_keys", _sort_json_object_keys)
    spark.udf.register("json_object_flatten", _json_object_flatten)
    return 7


def register_aliases(spark: SparkSession) -> int:
    """jsonb_* spellings of the mutation family (function_jsonb.cpp
    registers both name sets)."""
    spark.udf.register("jsonb_insert", _make3("insert"))
    spark.udf.register("jsonb_replace", _make3("replace"))
    spark.udf.register("jsonb_set", _make3("set"))
    spark.udf.register("sort_jsonb_object_keys", _sort_json_object_keys)
    return 4
