"""Recursive CTE (WITH RECURSIVE): native Spark path + driver fixpoint loop.

Reference analog: rec_cte sink/source/scan operators
(be/src/exec/operator/rec_cte_sink_operator.h:33, rec_cte_source_operator.h,
rec_cte_scan_operator.h; FE LogicalRecursiveUnion.java).

Two tiers:

1. **Native (preferred)** — Spark 4 executes `WITH RECURSIVE ... UNION ALL`
   JVM-side (UnionLoop operator; recursion depth capped by
   `spark.sql.cteRecursionLevelLimit`, default 100). Just `spark.sql()` it.
   Measured ~10x faster than the driver loop (rec_cte_bfs 17.7s -> 1.7s hot
   at sf0.1) because each level is an internal iteration, not a separate
   driver-scheduled job chain. UNION ALL is the only supported mode, so on
   cyclic graphs put `SELECT DISTINCT` in the recursive term: the frontier
   then stays bounded by |V| per level instead of counting paths.

2. **Driver loop (below)** — for UNION DISTINCT semantics (global dedup
   against the accumulated set, i.e. true semi-naive evaluation) or
   unbounded-depth recursion where only new rows may feed the next step.
   Each iteration is a full Catalyst-optimized plan over the previous
   frontier.

Scale design:
- UNION DISTINCT mode subtracts the accumulated result from each new
  frontier (the standard semi-naive evaluation — only *new* rows feed the
  next step), so work per iteration is proportional to the frontier, not
  the accumulated set.
- localCheckpoint() truncates lineage each iteration; without it the plan
  tree doubles per step and the driver OOMs on plan serialization long
  before data is a problem.
- Emptiness is tested with isEmpty() (limit-1 scan), not count().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def recursive_union(
    anchor: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    distinct: bool = True,
    max_iterations: int = 100,
    checkpoint_every: int = 1,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Evaluate WITH RECURSIVE: anchor UNION [ALL] step(frontier) ...

    `step` maps the previous iteration's frontier to the next candidate
    rows (same schema). Returns the accumulated result. Raises if
    max_iterations is exceeded (matching the reference's
    max_recursion_depth guard).

    `shuffle_partitions` sizes the per-iteration shuffles (join/subtract)
    to the expected FRONTIER, not the cluster: a bounded-frontier recursion
    (graph reachability over a small node set, org charts, BOM explosions)
    spends its time in stage scheduling, not data — measured 0.38s vs
    1.2s per iteration at 1 vs 32 partitions on a 25-node BFS. Leave None
    for unbounded frontiers (the session default applies). The session
    conf is restored after the loop.

    (Measured dead end, do not revisit: fusing k steps into one
    checkpoint job — 'unrolling' — is SLOWER than one job per step; the
    un-checkpointed step-k subtree is recomputed inside step k+1 and
    ReusedExchange does not rescue the nested subtract shapes.)
    """
    spark = anchor.sparkSession
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        frontier = anchor.localCheckpoint(eager=True)
        result = frontier
        for i in range(max_iterations):
            nxt = step(frontier)
            if distinct:
                # subtract IS "EXCEPT DISTINCT": it both dedups the frontier
                # and removes already-seen rows — one shuffle, not two.
                nxt = nxt.subtract(result)
            if (i + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                return result
            # The accumulator is a union over already-checkpointed frontiers:
            # each leaf is materialized, so the plan stays shallow without its
            # own per-iteration checkpoint job (subtract re-reads the cached
            # frontier blocks either way).
            result = result.unionByName(nxt)
            frontier = nxt
        raise RuntimeError(f"recursive_union: no fixpoint after {max_iterations} iterations")
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
