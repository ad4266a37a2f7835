"""Skew-salted join — explicit salting for hot keys.

Reference analog: nereids/rules/rewrite/SaltJoin.java / SkewJoin.java.
Spark's AQE handles skew for sort-merge joins at runtime; explicit salting
remains the tool when (a) the skew is known up front, (b) the join is
broadcast-ineligible, and (c) AQE's split threshold is too coarse.

Plan shape: the skewed (probe) side gets a random salt in [0, n); the
build side is replicated n× with every salt value (explode of a literal
range — map-side, no extra shuffle of the big side beyond the join's own).
The join key becomes (key, salt), splitting each hot key's rows across n
reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where `skewed`'s key distribution is heavy-tailed.
    `other` is replicated `salt_buckets`×; correctness is unchanged for
    inner/left joins on equi-keys (each skewed row matches exactly the one
    replica with its salt)."""
    on = list(on)
    salted_l = skewed.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salted_r = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_l.join(salted_r, on + ["__salt"], how)
    return out.drop("__salt")
