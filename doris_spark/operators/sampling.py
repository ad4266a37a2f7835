"""Sampling operators.

Reference: Doris TABLESAMPLE (DorisParser.g4 sample clause; used for stats
collection fe/.../statistics/). Engine-native random sampling
(`df.sample`) is not reproducible across engines, so the workhorse here is
a *deterministic* hash sample: a row is in the p-sample iff the first 16
bits of md5(key) fall below p·2^16. Properties that matter at 100 TB:

- embarrassingly parallel, no shuffle, no RNG state;
- stable under reruns and across engines (auditable sample membership);
- composable: the p1-sample of the p2-sample equals the min(p1,p2)-sample
  because membership is a pure function of the key.

`df.sample(fraction)` remains available for Bernoulli sampling when
reproducibility across engines is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """~fraction of rows, chosen by md5(key) prefix (16-bit resolution)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    thr = format(int(fraction * 65536), "04x")
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 4) < F.lit(thr)
    )
