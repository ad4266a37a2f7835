"""Python UDTF surface — table functions beyond the explode family.

Reference: Doris's Python UDTF bridge
(fe/fe-core/.../nereids/trees/expressions/functions/udf/PythonUdtf.java,
be/src/exprs/table_function/python_udtf_function.h — an out-of-process
Python server per BE). PySpark has this natively (`@udtf`, Spark 3.5+):
the UDTF runs inside the executor's Python worker over Arrow batches, so
it scales with the scan parallelism instead of a per-node sidecar server.

Two table functions Doris ships as builtins that Spark's explode family
does not cover directly:

- sentences(text): split into (sentence_idx, sentence, n_tokens) rows —
  the tokenize→explode pattern with positional metadata.
- numbers_gap(start, end, step): DataGen-style range with arbitrary step
  (Doris `numbers("number"="N")` TVF generalization; spark.range covers
  the common case and remains the preferred path).
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sentence_idx: int, sentence: string, n_tokens: int")
class SentencesUDTF:
    """One output row per sentence of the input text."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        for i, s in enumerate(p for p in _SENT_SPLIT.split(text.strip()) if p):
            yield i, s, len(s.split())


@udtf(returnType="n: bigint")
class NumbersGapUDTF:
    """Range with arbitrary step; empty for non-advancing steps."""

    def eval(self, start: int, end: int, step: int):  # noqa: D102
        if start is None or end is None or not step:
            return
        n = start
        if step > 0:
            while n < end:
                yield (n,)
                n += step
        else:
            while n > end:
                yield (n,)
                n += step


def register(spark: SparkSession) -> int:
    spark.udtf.register("sentences", SentencesUDTF)
    spark.udtf.register("numbers_gap", NumbersGapUDTF)
    return 2
