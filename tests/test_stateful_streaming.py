"""applyInPandasWithState: running per-user totals across micro-batches
must converge to the batch groupBy answer."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from doris_spark.session import load_tables
from doris_spark.streaming.ingest import read_event_stream
from doris_spark.streaming.stateful import running_user_totals


@pytest.fixture()
def events_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ev_state_")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(d + "/p0")
    raw.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(d + "/p1")
    i = 0
    for sub in ("p0", "p1"):
        for f in os.listdir(f"{d}/{sub}"):
            if f.endswith(".parquet"):
                shutil.move(f"{d}/{sub}/{f}", f"{d}/file_{i}.parquet")
                i += 1
        shutil.rmtree(f"{d}/{sub}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_running_totals_converge(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    # update mode emits one row per user per micro-batch that touched it;
    # the LAST emission per user is the converged state. The memory sink
    # appends in batch order, so max(n_events) per user == final state.
    rows = spark.sql(
        "SELECT user_id, max(n_events) AS n, max_by(total_value, n_events) AS t "
        "FROM t_state GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in rows}
    ev = load_tables(spark, sf_dir)["events"]
    want_rows = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("t")
    ).collect()
    want = {r["user_id"]: (r["n"], round(r["t"], 6)) for r in want_rows}
    assert got == want
