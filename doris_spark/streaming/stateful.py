"""Custom stateful streaming operators via applyInPandasWithState.

SURVEY §2.11 / build-plan item: where the reference handles continuous
per-key state through UNIQUE-key upsert + AGG-key tables, Spark offers
arbitrary per-key state in Structured Streaming. This module implements
the canonical example — per-user running aggregates maintained across
micro-batches — the building block for streaming retention/funnel state.

State layout: one row (cnt, total, last_ts_micros) per user_id, stored in
Spark's state store (checkpointed, rescalable by key hash at cluster
scale). Arrow batches in, Arrow batches out — no per-row Python overhead.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cnt, total = state.get
    else:
        cnt, total = 0, 0.0
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": cnt, "total_value": total}]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) — emits the current
    state row for every user touched by each micro-batch (Update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
