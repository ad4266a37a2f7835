"""Streaming ingest + stateful processing.

Reference analogs:
- Routine Load (Kafka → table, exactly-once): fe/.../load/routineload/
  RoutineLoadJob.java, be/src/load/routine_load/data_consumer.h:127 →
  `spark.readStream.format("kafka")` + foreachBatch + checkpoint. Kafka
  isn't available in this container, so the file source stands in — the
  plan shape (source → transform → sink w/ checkpoint) is identical.
- Stream Load (HTTP micro-batch push): be/src/load/stream_load/ → file/
  directory streaming source (each dropped file = one micro-batch).
- UNIQUE_KEYS upsert with sequence column: KeysType.java:28,
  partial_update_info.h → foreachBatch merge keeping max-sequence row.
- Group commit / MTMV incremental refresh: micro-batching + incremental
  windowed aggregation with watermark.

The batch views in operators/table_models.py and these streaming writers
produce identical table states (tested in tests/test_streaming.py).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def _events_stream_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# Default wire schema (current fixture encoding: naive micros). Kafka
# JSON payloads also parse cleanly into this shape.
from pyspark.sql.types import TimestampNTZType as _TimestampNTZType

EVENTS_STREAM_SCHEMA = _events_stream_schema(_TimestampNTZType())


def _ts_physical_type(path: str) -> str:
    """Arrow type string of `ts` in the first parquet file under `path`
    ('' if none exist yet — callers then assume microsecond timestamps,
    the current fixture encoding)."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if os.path.isfile(path):
        files = [path]
    if not files:
        return ""
    return str(pq.read_schema(files[0]).field("ts").type)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File streaming source over the events fixture (stream-load parity:
    every new file in `path` becomes a micro-batch).

    The fixture's `ts` encoding has shipped both as TIMESTAMP(NANOS)
    (read as long via nanosAsLong, floor-converted like the batch path)
    and as naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ, cast to the
    session-UTC TimestampType) — detect per-directory instead of
    hard-coding either."""
    from pyspark.sql.types import TimestampNTZType

    t = _ts_physical_type(path)
    if t.startswith("timestamp[ns"):
        raw = (
            spark.readStream.schema(_events_stream_schema(LongType()))
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = (
        spark.readStream.schema(_events_stream_schema(TimestampNTZType()))
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation — incremental MTMV analog.
    Late rows beyond the watermark are dropped (the reference instead
    upserts them via UNIQUE keys; both paths are provided)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "total_value")
    )


def upsert_writer(
    target_dir: str,
    keys: Sequence[str],
    sequence_col: str,
    tiebreak: Sequence[str] = (),
):
    """foreachBatch UNIQUE_KEYS merge: each micro-batch is merged into the
    target (parquet dir) keeping the max-sequence row per key — Doris
    merge-on-write analog. On Delta/Iceberg this would be MERGE INTO; on
    plain parquet we rewrite the (small) merged state, which is the
    overwrite-refresh MTMV pattern."""
    from doris_spark.operators.table_models import unique_key_view

    def write(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if os.path.exists(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            current = spark.read.parquet(target_dir)
            merged_src = current.unionByName(batch)
        else:
            merged_src = batch
        merged = unique_key_view(
            merged_src, keys=keys, sequence_col=sequence_col, tiebreak=tiebreak
        )
        # Write to a temp dir then atomically swap — a micro-batch must not
        # read its own partial output.
        tmp = target_dir.rstrip("/") + f".tmp{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        if os.path.exists(target_dir):
            shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)

    return write


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming DataFrame into the in-memory sink (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def read_kafka_routine_load(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: StructType | str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Routine Load parity over a real Kafka source
    (fe/.../load/routineload/RoutineLoadJob.java; consumer
    be/src/load/routine_load/data_consumer.h:127 KafkaDataConsumer).

    Source offsets are tracked in the streaming checkpoint, giving the
    same exactly-once contract Doris gets from committing Kafka offsets
    inside the load transaction. Downstream, reuse the identical plan
    shape as the file path: transform → `upsert_writer` foreachBatch.

    Requires the spark-sql-kafka connector on the classpath; in
    environments without it (like this container) Spark raises its
    data-source-not-found error at load() — callers should treat that as
    "Kafka not available here", not a code failure.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("r"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("r.*", "kafka_ts")
