"""damerau_levenshtein — unrestricted Damerau-Levenshtein distance.

Reference: the string-distance family in
be/src/exprs/function/function_levenshtein.cpp (levenshtein itself is a
Spark builtin; the damerau variant is not). The distance needs dynamic
programming — no closed-form SQL expression — so this is the sanctioned
Python path: an Arrow-batched pandas UDF (one JVM→Python round trip per
batch). This is the *full* variant (a transposition may be followed by
further edits of the transposed characters: 'CA'→'ABC' = 2), matching
DuckDB's damerau_levenshtein, which the oracle query uses.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType


def dl_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (Lowrance–Wagner)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    last_row_of: dict[str, int] = {}
    # (la+2) x (lb+2) with a sentinel border row/col of maxdist.
    d = [[maxdist] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            k = last_row_of.get(b[j - 1], 0)
            m = last_col
            if a[i - 1] == b[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitute / match
                d[i + 1][j] + 1,  # insert
                d[i][j + 1] + 1,  # delete
                d[k][m] + (i - k - 1) + 1 + (j - m - 1),  # transpose
            )
        last_row_of[a[i - 1]] = i
    return d[la + 1][lb + 1]


@pandas_udf(IntegerType())
def _damerau_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    out = []
    for x, y in zip(a, b):
        out.append(None if x is None or y is None else dl_distance(x, y))
    return pd.Series(out, dtype="Int32")


def register(spark: SparkSession) -> int:
    spark.udf.register("damerau_levenshtein", _damerau_udf)
    spark.udf.register("damerau_levenshtein_distance", _damerau_udf)
    return 2
