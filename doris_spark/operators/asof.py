"""ASOF join — nearest-key temporal join.

Reference analog: Doris ASOF join types (TJoinOp ASOF_* in
gensrc/thrift/PlanNodes.thrift:1040-1063; probe impls
be/src/exec/operator/join/asof_left_inner_join_impl.cpp; grammar
fe/fe-sql-parser/.../DorisParser.g4:1467-1468). Spark has no native ASOF
join, so we implement it as a union + window plan:

    tag left rows (side=1) and right rows (side=0), union them sorted by
    (on-keys, ts), and carry the latest right row forward with last_value
    IGNORE NULLS over (partitionBy on-keys, orderBy ts, side) — then keep
    only left rows.

Scale properties: ONE shuffle on the equality keys (same as any shuffle
join), no range explosion, no cross product; window runs partition-local
after the shuffle. Skewed keys behave like any window partition (salting
can be layered on the `on` keys if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    how: str = "inner",
    allow_exact_matches: bool = True,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts (direction='backward') or smallest right_ts >=
    left_ts ('forward'), matching on the equality keys `on`.

    how: 'inner' drops unmatched left rows, 'left' keeps them with nulls.
    Right payload columns are prefixed with `right_prefix` (the right ts
    column becomes e.g. ``r_ts``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)

    right_payload = [c for c in right.columns if c not in on]
    # Tag and align the two sides on a common schema.
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in right_payload:
        l_tagged = l_tagged.withColumn(right_prefix + c, F.lit(None).cast(right.schema[c].dataType))
    r_tagged = right.select(
        *on,
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(right_prefix + c) for c in right_payload],
    )
    for c in left.columns:
        if c not in on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = on + ["__side", "__ts"] + [c for c in left.columns if c not in on] + [
        right_prefix + c for c in right_payload
    ]
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    if direction == "backward":
        # Right rows sort before left rows at equal ts iff exact matches count.
        order = [F.col("__ts").asc(), F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc() if allow_exact_matches else F.col("__side").desc()]
        frame = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)

    filled = unioned
    for c in right_payload:
        filled = filled.withColumn(
            right_prefix + c,
            F.last(F.when(F.col("__side") == 0, F.col(right_prefix + c)), ignorenulls=True).over(frame),
        )
    # Matched flag: was there any right row in frame? Use the right ts carry.
    filled = filled.withColumn(
        "__matched",
        F.last(F.when(F.col("__side") == 0, F.lit(1)), ignorenulls=True).over(frame),
    )
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__matched") == 1)
    elif how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    return out.drop("__side", "__ts", "__matched")
