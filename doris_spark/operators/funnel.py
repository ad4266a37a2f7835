"""Event-sequence aggregates: window_funnel / retention / sequence_match.

Reference analogs (aggregate functions in the reference's surface,
SURVEY §2.4): be/src/exprs/aggregate/aggregate_function_window_funnel_v2.h,
aggregate_function_retention.h, aggregate_function_sequence_match.h.

Spark-first design: instead of a custom UDAF holding per-user event lists
in Python, each is expressed as join/aggregation plans over the event
stream — partial aggregation and shuffle-on-user parallelism come free,
and no per-user event list ever materializes in driver or Python memory.

window_funnel semantics implemented: strict-order leading-chain — step 1
anchors at the user's earliest step-1 event t1; step i+1 matches the
earliest step-(i+1) event strictly after the step-i match and within
t1 + window. (This is the deterministic "first chain" reading used by the
reference's regression cases.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    window_seconds: int,
    mode: str = "increase",
) -> DataFrame:
    """Per-user funnel level: (user, level) where level = number of steps
    completed in order within `window_seconds` of the first step-1 event.

    `mode` mirrors the reference's window_funnel modes
    (aggregate_function_window_funnel_v2.h): "increase" requires strictly
    increasing timestamps between consecutive steps; "default" lets a
    same-timestamp event advance the funnel; "deduplication" is
    strict-increase plus: the funnel stops at level i if an event of an
    already-matched step type recurs strictly between the step-i match
    and the candidate step-(i+1) match. "fixed" is strict-increase plus:
    any funnel-step event other than the expected next step occurring
    strictly between the matches stops the funnel (non-step events may
    interleave freely in both modes).

    Plan: ONE shuffle — events are filtered to funnel-step types, mapped
    to a narrow (ts, step_idx) struct, collected per user (partial
    aggregation applies; the per-user state is bounded by that user's
    step-event count, the same state the reference's
    aggregate_function_window_funnel_v2.h buffers), and the whole chain
    (earliest step-1 anchor, min-after-previous candidates, the
    deduplication/fixed violation windows) is evaluated as staged
    higher-order expressions over the array. Replaces the previous
    k-join/anti-join chain (~2k shuffles); semantics are identical —
    each stage mirrors the old join predicate exactly.
    """
    if mode not in ("increase", "default", "deduplication", "fixed"):
        raise ValueError(f"unsupported window_funnel mode {mode}")
    if len(set(steps)) != len(steps):
        # The step-index when-chain maps each event to its FIRST matching
        # step, so a type repeated at two funnel positions would silently
        # cap the level at the first occurrence (sequence_match handles
        # overlap with a bitmask; this operator does not — ADVICE r11).
        raise ValueError(f"window_funnel steps must be distinct, got {list(steps)}")
    k = len(steps)
    win = F.expr(f"INTERVAL {window_seconds} SECOND")

    sidx = F.when(F.col(type_col) == steps[0], F.lit(0))
    for i, s in enumerate(steps[1:], start=1):
        sidx = sidx.when(F.col(type_col) == s, F.lit(i))
    per_user = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.collect_list(
                F.struct(F.col(ts_col).alias("t"), sidx.alias("s"))
            ).alias("evs")
        )
    )

    def _step_min(idx: int, lo, strict: bool, deadline):
        """Earliest step-`idx` event in (lo, deadline] (or [lo, ..] when
        not strict) — the old join's min(nts) under the same predicate."""
        return F.array_min(
            F.transform(
                F.filter(
                    F.col("evs"),
                    lambda e: (e["s"] == idx)
                    & ((e["t"] > lo) if strict else (e["t"] >= lo))
                    & (e["t"] <= deadline),
                ),
                lambda e: e["t"],
            )
        )

    # Staged selects keep each chain value a named column so Catalyst
    # doesn't re-inline the array scans into every downstream predicate.
    df = per_user.select(
        "user",
        "evs",
        F.array_min(
            F.transform(
                F.filter(F.col("evs"), lambda e: e["s"] == 0), lambda e: e["t"]
            )
        ).alias("t1"),
    ).filter(F.col("t1").isNotNull())
    df = df.select("user", "evs", "t1", (F.col("t1") + win).alias("tmax"))

    prev = "t1"
    adv_cols: list[str] = []
    for i, step in enumerate(steps[1:], start=2):
        cand = _step_min(
            i - 1, F.col(prev), mode != "default", F.col("tmax")
        )
        df = df.select("*", cand.alias(f"c{i}"))
        ok = F.col(f"c{i}").isNotNull()
        if mode in ("deduplication", "fixed"):
            viol_idx = (
                list(range(i - 1))
                if mode == "deduplication"
                else [j for j in range(k) if j != i - 1]
            )
            viol = F.exists(
                F.col("evs"),
                lambda e: e["s"].isin(viol_idx)
                & (e["t"] > F.col(prev))
                & (e["t"] < F.col(f"c{i}")),
            )
            ok = ok & ~viol
        cum = ok if not adv_cols else (F.col(adv_cols[-1]) & ok)
        df = df.select("*", cum.alias(f"a{i}"))
        adv_cols.append(f"a{i}")
        prev = f"c{i}"
    level = F.lit(1)
    for a in adv_cols:
        level = level + F.col(a).cast("int")
    return df.select("user", level.alias("level"))


def retention(
    events: DataFrame,
    user_col: str,
    conditions: Sequence,
) -> DataFrame:
    """Doris `retention(cond1, cond2, ...)`: per user an array of flags —
    flag[0] = cond1 ever true; flag[i] = cond1 AND cond_{i+1} both true.

    `conditions` are boolean Column expressions over the event row.
    """
    aggs = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__c{i}")
        for i, c in enumerate(conditions)
    ]
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    flags = [F.col("__c0")] + [
        (F.col("__c0") * F.col(f"__c{i}")) for i in range(1, len(conditions))
    ]
    return per_user.select("user", F.array(*flags).alias("r"))


def sequence_match(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds: Sequence,
) -> DataFrame:
    """Doris sequence_match('(?1).*(?2)...') boolean per user: do events
    matching cond1, cond2, ... occur in timestamp order (not necessarily
    adjacent)? Greedy min-after-previous chain (exact for unbounded gaps).

    Plan: ONE shuffle — events are tagged with a condition bitmask (an
    event may satisfy several conditions), rows matching none are dropped
    BEFORE the per-user collect (partial aggregation applies; per-user
    state is bounded by that user's matching events, the same state the
    reference's aggregate_function_sequence_match.h buffers), then the
    chain is evaluated as staged array expressions that replicate the old
    chained join+min-aggregate predicates exactly (min cond_i timestamp
    strictly after the step-(i-1) match). Replaces the previous
    k-round join/aggregate chain (one shuffle pair per condition)."""
    mask = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask = term if mask is None else mask.bitwiseOR(term)
    per_user = (
        events.withColumn("__m", mask)
        .filter(F.col("__m") > 0)
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.collect_list(
                F.struct(F.col(ts_col).alias("t"), F.col("__m").alias("m"))
            ).alias("evs")
        )
    )

    def _step_min(idx: int, lo):
        """Earliest cond-`idx` event strictly after `lo` (None = no lower
        bound) — the old join round's min(nts) under the same predicate."""
        bit = F.lit(1 << idx)
        return F.array_min(
            F.transform(
                F.filter(
                    F.col("evs"),
                    lambda e: (e["m"].bitwiseAND(bit) != 0)
                    if lo is None
                    else (e["m"].bitwiseAND(bit) != 0) & (e["t"] > lo),
                ),
                lambda e: e["t"],
            )
        )

    # Staged selects keep each chain value a named column (same rationale
    # as window_funnel: stop Catalyst re-inlining the array scans).
    df = per_user.select("user", "evs", _step_min(0, None).alias("t1")).filter(
        F.col("t1").isNotNull()
    )
    prev = "t1"
    for i in range(1, len(conds)):
        col = f"t{i + 1}"
        df = df.select("*", _step_min(i, F.col(prev)).alias(col)).filter(
            F.col(col).isNotNull()
        )
        prev = col
    return df.select("user", F.lit(True).alias("matched"))


def sequence_match_gaps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds: Sequence,
    gaps: Sequence,
) -> DataFrame:
    """sequence_match with per-step time conditions — Doris pattern
    '(?1)(?t>=3600)(?2)' (aggregate_function_sequence_match.h time
    operators). `gaps[i]` constrains the gap between the step-i match and
    the step-i+1 match: None (any positive gap) or (op, seconds) with op
    in > >= < <=.

    EXACT set-semantics DP, not greedy: S_i = every timestamp at which
    step i can complete with all prefix constraints satisfied; step i+1
    checks each candidate against the running min/max of S_i that is
    STRICTLY earlier (a lower-bounded gap is easiest against the earliest
    predecessor, an upper-bounded gap against the latest — checking both
    extremes decides existence exactly). Greedy earliest-match (the plan
    used by plain sequence_match) is WRONG for upper-bounded gaps: with
    events s@0 s@50 p@60 and (?t<=30), the earliest s fails but s@50
    matches.

    Plan shape: one union + window pass per step (range frame on epoch
    micros enforces strict precedence) — k-1 shuffles on the user key for
    a k-step pattern, no joins, no explosion. Intermediate candidate sets
    are NOT deduplicated: duplicate (user, t) rows cannot change the
    running min/max the next step reads, and skipping the distinct drops
    one exchange per step; only the final user set is deduplicated.

    Returns (user, matched=true) for users whose stream matches.
    """
    ops = {
        ">": lambda gap, n: gap > n,
        ">=": lambda gap, n: gap >= n,
        "<": lambda gap, n: gap < n,
        "<=": lambda gap, n: gap <= n,
    }
    if len(gaps) != len(conds) - 1:
        raise ValueError("need exactly len(conds)-1 gap constraints (None allowed)")
    cur = events.filter(conds[0]).select(
        F.col(user_col).alias("user"), F.col(ts_col).alias("t")
    )
    for cond, gap in zip(conds[1:], gaps):
        prev = cur.select(
            "user",
            F.col("t").alias("ts"),
            F.lit(0).alias("is_cand"),
            F.col("t").alias("pt"),
        )
        cand = events.filter(cond).select(
            F.col(user_col).alias("user"),
            F.col(ts_col).alias("ts"),
            F.lit(1).alias("is_cand"),
            F.lit(None).cast(prev.schema["pt"].dataType).alias("pt"),
        )
        u = prev.unionByName(cand).withColumn("us", F.unix_micros(F.col("ts")))
        # RANGE frame on epoch-micros: strictly-earlier rows only.
        w = (
            Window.partitionBy("user")
            .orderBy("us")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        scanned = u.select(
            "user",
            "ts",
            "is_cand",
            "us",
            F.min(F.when(F.col("is_cand") == 0, F.col("us"))).over(w).alias("mn"),
            F.max(F.when(F.col("is_cand") == 0, F.col("us"))).over(w).alias("mx"),
        ).filter((F.col("is_cand") == 1) & F.col("mn").isNotNull())
        if gap is not None:
            op, secs = gap
            if op not in ops:
                raise ValueError(f"unsupported gap operator {op!r}")
            micros = int(secs * 1_000_000)
            # lower bounds test the EARLIEST predecessor, upper the LATEST
            ref = F.col("mn") if op in (">", ">=") else F.col("mx")
            scanned = scanned.filter(ops[op](F.col("us") - ref, F.lit(micros)))
        cur = scanned.select("user", F.col("ts").alias("t"))
    return cur.select("user").distinct().withColumn("matched", F.lit(True))


def sequence_count(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    conds: Sequence,
) -> DataFrame:
    """Doris sequence_count('(?1).*(?2)...') per user: how many
    NON-OVERLAPPING chains cond1 → cond2 → ... occur in timestamp order
    (arbitrary events allowed between steps)? Greedy left-to-right scan —
    the standard sequence_count semantics
    (be/src/exprs/aggregate/aggregate_function_sequence_match.h).

    Plan: one condition-bitmask projection, rows matching no condition are
    dropped BEFORE the per-user collect (the per-user array holds only
    participating events, bounded by funnel activity, not raw event volume),
    then a single JVM-side `aggregate` fold. State is one BIGINT encoding
    count * (k+1) + stage — no Python in the loop, one shuffle total.

    Returns (user, n_matches) with n_matches >= 0 for every user that has
    at least one condition-matching event.
    """
    k = len(conds)
    # Bitwise OR (not sum): an event may satisfy several conditions.
    mask = None
    for i, c in enumerate(conds):
        term = F.when(c, F.lit(1 << i)).otherwise(F.lit(0))
        mask = term if mask is None else mask.bitwiseOR(term)
    per_user = (
        events.withColumn("__m", mask.cast("bigint"))
        .filter(F.col("__m") > 0)
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.sort_array(F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col("__m").alias("m")))).alias("evs"))
    )
    mod = k + 1
    fold = (
        f"aggregate(evs, CAST(0 AS BIGINT), (s, e) -> "
        f"CASE WHEN ((e.m >> CAST(s % {mod} AS INT)) & 1) = 1 THEN "
        f"CASE WHEN s % {mod} = {k - 1} THEN s - (s % {mod}) + {mod} ELSE s + 1 END "
        f"ELSE s END)"
    )
    return per_user.select("user", (F.expr(fold) / mod).cast("bigint").alias("n_matches"))
