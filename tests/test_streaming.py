"""Structured Streaming parity: the streaming plans must converge to the
same table state as their batch equivalents (SURVEY §2.11 —
routine-load / stream-load / MTMV analogs)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from doris_spark.operators.table_models import unique_key_view
from doris_spark.session import load_tables
from doris_spark.streaming.ingest import (
    read_event_stream,
    run_stream_to_memory,
    tumbling_counts,
    upsert_writer,
)


@pytest.fixture()
def events_dir(spark, sf_dir):
    """Copy the events parquet into a streaming source dir (2 'arriving'
    files so the stream sees multiple micro-batches)."""
    d = tempfile.mkdtemp(prefix="ev_stream_")
    ev = load_tables(spark, sf_dir)["events"]
    # split into two halves, written as raw nanos (same as driver fixture)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(d + "/p0")
    raw.filter(F.col("event_id") % 2 == 1).write.mode("overwrite").parquet(d + "/p1")
    # flatten: move part files up so the dir is one streaming source
    i = 0
    for sub in ("p0", "p1"):
        for f in os.listdir(f"{d}/{sub}"):
            if f.endswith(".parquet"):
                shutil.move(f"{d}/{sub}/{f}", f"{d}/file_{i}.parquet")
                i += 1
        shutil.rmtree(f"{d}/{sub}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = read_event_stream(spark, events_dir)
    agg = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    run_stream_to_memory(agg, "t_tumbling", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): (r["cnt"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    ev = load_tables(spark, sf_dir)["events"]
    want_rows = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("tv"))
        .collect()
    )
    want = {(r["w"]["start"], r["event_type"]): (r["cnt"], round(r["tv"], 6)) for r in want_rows}
    assert got == want


def test_stream_upsert_matches_batch_view(spark, sf_dir, events_dir):
    target = tempfile.mkdtemp(prefix="upsert_tgt_")
    shutil.rmtree(target)  # writer creates it
    stream = read_event_stream(spark, events_dir)
    q = (
        stream.writeStream.foreachBatch(
            upsert_writer(target, keys=["user_id", "event_type"], sequence_col="ts", tiebreak=["event_id"])
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = (
        spark.read.parquet(target)
        .select("user_id", "event_type", "ts", "value")
        .orderBy("user_id", "event_type")
        .collect()
    )
    ev = load_tables(spark, sf_dir)["events"]
    want = (
        unique_key_view(ev, keys=["user_id", "event_type"], sequence_col="ts", tiebreak=["event_id"])
        .select("user_id", "event_type", "ts", "value")
        .orderBy("user_id", "event_type")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    shutil.rmtree(target, ignore_errors=True)


def test_kafka_routine_load_wiring(spark):
    """No broker/connector in this container: assert the Kafka source path
    reaches Spark's data-source resolution (i.e. our wiring is correct and
    the only missing piece is the classpath JAR). If a connector IS
    present, the unstarted streaming DataFrame must expose the parsed
    schema."""
    import pytest
    from doris_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        read_kafka_routine_load,
    )

    try:
        df = read_kafka_routine_load(
            spark, "localhost:9092", "events", EVENTS_STREAM_SCHEMA
        )
    except Exception as e:  # noqa: BLE001 — asserting on the failure class
        msg = str(e)
        assert "kafka" in msg.lower() and (
            "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
        ), f"unexpected failure mode: {msg[:300]}"
        pytest.xfail("kafka connector not on classpath (expected here)")
    assert df.isStreaming
    assert set(EVENTS_STREAM_SCHEMA.fieldNames()) <= set(df.columns)


def test_restart_exactly_once_upsert(spark):
    """Kafka-shape exactly-once restart (VERDICT r5 ask #10): a
    checkpointed routine-load stream killed mid-run — including a crash
    AFTER the sink side-effect but BEFORE the offset commit — must, on
    restart, (a) resume from the checkpointed offsets (replaying only the
    uncommitted batch, never reprocessing committed ones) and (b)
    converge to the same state as the batch unique-key view because the
    foreachBatch merge is idempotent under replay. That pair is the same
    contract Doris routine load gets from committing Kafka offsets inside
    the load transaction (be/src/load/routine_load/data_consumer.h:127)."""
    src = tempfile.mkdtemp(prefix="rl_src_")
    ckpt = tempfile.mkdtemp(prefix="rl_ckpt_")
    target = tempfile.mkdtemp(prefix="rl_tgt_")
    shutil.rmtree(target)  # writer creates it

    schema = "id INT, val DOUBLE, seq INT"

    def drop_file(name, rows):
        df = spark.createDataFrame(rows, schema)
        tmp = src + ".tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(src, name))
        shutil.rmtree(tmp)

    drop_file("f0.parquet", [(1, 1.0, 1), (2, 2.0, 1)])
    drop_file("f1.parquet", [(1, 10.0, 2), (3, 3.0, 1)])

    seen = []  # (batch_id) invocations across all runs
    crash_once = {"armed": True}
    base = upsert_writer(target, keys=["id"], sequence_col="seq")

    def writer(batch, batch_id):
        base(batch, batch_id)  # sink side-effect lands first...
        seen.append(batch_id)
        if crash_once["armed"] and batch_id == 1:
            crash_once["armed"] = False
            raise RuntimeError("injected crash before offset commit")

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(writer)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    except Exception:
        pass
    assert q.exception() is not None, "injected crash must fail the query"

    # restart: batch 1 replays (uncommitted), batch 0 must NOT reprocess
    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert seen == [0, 1, 1], seen

    # new data after a clean stop: only the new file forms a batch
    drop_file("f2.parquet", [(2, 20.0, 2), (4, 4.0, 1)])
    q3 = start()
    q3.processAllAvailable()
    q3.stop()
    assert seen == [0, 1, 1, 2], seen

    got = {
        r["id"]: (r["val"], r["seq"])
        for r in spark.read.parquet(target).collect()
    }
    all_rows = spark.createDataFrame(
        [(1, 1.0, 1), (2, 2.0, 1), (1, 10.0, 2), (3, 3.0, 1),
         (2, 20.0, 2), (4, 4.0, 1)],
        schema,
    )
    want = {
        r["id"]: (r["val"], r["seq"])
        for r in unique_key_view(
            all_rows, keys=["id"], sequence_col="seq"
        ).collect()
    }
    assert got == want == {
        1: (10.0, 2), 2: (20.0, 2), 3: (3.0, 1), 4: (4.0, 1)
    }
    for d in (src, ckpt, target):
        shutil.rmtree(d, ignore_errors=True)


def test_stream_dedup_within_watermark(spark, sf_dir, events_dir):
    """Streaming dedup (routine-load duplicate suppression analog):
    dropDuplicatesWithinWatermark collapses replays of the same event_id
    across micro-batches into one row."""
    from doris_spark.streaming.ingest import read_event_stream

    # Duplicate every file: same events arrive twice across micro-batches.
    import shutil as _sh

    for f in list(os.listdir(events_dir)):
        if f.endswith(".parquet"):
            _sh.copy(f"{events_dir}/{f}", f"{events_dir}/dup_{f}")

    stream = read_event_stream(spark, events_dir)
    deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    run_stream_to_memory(
        deduped.groupBy().agg(F.count(F.lit(1)).alias("n")), "dedup_cnt",
        output_mode="complete",
    )
    got = spark.sql("SELECT n FROM dedup_cnt").collect()[0]["n"]
    want = load_tables(spark, sf_dir)["events"].count()
    assert got == want


def test_arrow_out(spark, sf_dir):
    """MemoryScratchSink / Arrow Flight SQL analog
    (be/src/exec/operator/memory_scratch_sink_operator.h): results leave
    the engine as Arrow, zero-copy into the Python ecosystem."""
    import pyarrow as pa

    t = load_tables(spark, sf_dir)["nation"].orderBy("n_nationkey").toArrow()
    assert isinstance(t, pa.Table)
    assert t.num_rows == 25
    assert t.column("n_name")[0].as_py() == "NATION_0"
