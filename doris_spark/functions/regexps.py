"""Regexp variants Spark lacks: regexp_replace_one.

Reference: be/src/exprs/function/function_regexp.cpp
(regexp_replace_one replaces only the FIRST match; regexp_replace
replaces all). No expression-level formulation is safe for anchored or
context-dependent patterns (locating the first match's position via
instr on the matched text is wrong for patterns like 'a$'), so this is a
pandas UDF over Python re.sub(count=1).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


@pandas_udf(StringType())
def _regexp_replace_one(s: pd.Series, p: pd.Series, r: pd.Series) -> pd.Series:
    out = []
    for a, b, c in zip(s, p, r):
        if a is None or b is None or c is None:
            out.append(None)
            continue
        try:
            out.append(re.sub(b, c, a, count=1))
        except re.error:
            out.append(None)
    return pd.Series(out, dtype=object)


def register(spark: SparkSession) -> int:
    spark.udf.register("regexp_replace_one", _regexp_replace_one)
    return 1
