"""MTMV partition-level incremental refresh (doris_spark/streaming/mtmv.py).

Pins the Doris MTMV refresh contract (fe/.../mtmv/MTMVPartitionUtil.java):
only partitions whose base data changed are recomputed; unchanged
partitions are neither read-heavy nor rewritten; dropped base partitions
disappear from the MV; the MV always equals a full recompute.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from doris_spark.streaming.mtmv import MaterializedView


def _definition(base):
    return base.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total")
    )


def _mv_equals_full(mv, base):
    full = {tuple(r) for r in _definition(base).collect()}
    # parquet partition columns come back typed as read; normalize order
    got = {tuple(r) for r in mv.read().select("day", "event_type", "cnt", "total").collect()}
    assert got == full


@pytest.fixture()
def base_path(tmp_path):
    return str(tmp_path / "base.parquet")


def _write_base(spark, path, rows):
    df = spark.createDataFrame(rows, "day STRING, event_type STRING, value DOUBLE")
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def test_mtmv_partition_incremental_refresh(spark, tmp_path, base_path):
    rows = [
        ("2024-01-01", "view", 1.0),
        ("2024-01-01", "click", 2.0),
        ("2024-01-02", "view", 3.0),
        ("2024-01-03", "view", 4.0),
    ]
    _write_base(spark, base_path, rows)
    mv = MaterializedView(
        spark, "daily_counts", str(tmp_path / "mv"), _definition, "day"
    )
    base = spark.read.parquet(base_path)

    # 1) first refresh materializes every partition
    r1 = mv.refresh(base)
    assert r1["refreshed"] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert r1["dropped"] == []
    _mv_equals_full(mv, base)

    # 2) no changes -> no partition refreshed
    r2 = mv.refresh(spark.read.parquet(base_path))
    assert r2["refreshed"] == []
    assert r2["unchanged"] == ["2024-01-01", "2024-01-02", "2024-01-03"]

    # 3) append into ONE partition -> only that partition refreshes
    extra = spark.createDataFrame(
        [("2024-01-02", "click", 9.0)], "day STRING, event_type STRING, value DOUBLE"
    )
    extra.write.mode("append").partitionBy("day").parquet(base_path)
    base = spark.read.parquet(base_path)
    r3 = mv.refresh(base)
    assert r3["refreshed"] == ["2024-01-02"]
    assert set(r3["unchanged"]) == {"2024-01-01", "2024-01-03"}
    _mv_equals_full(mv, base)

    # 4) new partition arrives -> only it refreshes
    extra2 = spark.createDataFrame(
        [("2024-01-04", "view", 5.0)], "day STRING, event_type STRING, value DOUBLE"
    )
    extra2.write.mode("append").partitionBy("day").parquet(base_path)
    base = spark.read.parquet(base_path)
    r4 = mv.refresh(base)
    assert r4["refreshed"] == ["2024-01-04"]
    _mv_equals_full(mv, base)


def test_mtmv_dropped_partition_removed(spark, tmp_path, base_path):
    rows = [("2024-01-01", "view", 1.0), ("2024-01-02", "view", 2.0)]
    _write_base(spark, base_path, rows)
    mv = MaterializedView(spark, "d2", str(tmp_path / "mv2"), _definition, "day")
    mv.refresh(spark.read.parquet(base_path))

    # rewrite base without day=2024-01-02
    _write_base(spark, base_path, [("2024-01-01", "view", 1.0)])
    base = spark.read.parquet(base_path)
    r = mv.refresh(base)
    assert r["dropped"] == ["2024-01-02"]
    assert not os.path.exists(str(tmp_path / "mv2" / "d2.mv.parquet" / "day=2024-01-02"))
    _mv_equals_full(mv, base)


def test_mtmv_definition_must_keep_partition_col(spark, tmp_path, base_path):
    _write_base(spark, base_path, [("2024-01-01", "view", 1.0)])
    mv = MaterializedView(
        spark,
        "bad",
        str(tmp_path / "mv3"),
        lambda b: b.groupBy("event_type").count(),
        "day",
    )
    with pytest.raises(ValueError, match="partition column"):
        mv.refresh(spark.read.parquet(base_path))


def test_mtmv_noop_refresh_runs_zero_jobs(spark, tmp_path, base_path):
    """MTMVRefreshSnapshot analog: staleness is decided from file
    METADATA (path+size+mtime listing), so a refresh against an
    unchanged base must launch ZERO Spark jobs — at 100 TB a no-op
    refresh costs a listing, not a scan."""
    _write_base(spark, base_path, [("2024-01-01", "view", 1.0)])
    mv = MaterializedView(spark, "z0", str(tmp_path / "mvz"), _definition, "day")
    mv.refresh(spark.read.parquet(base_path))

    base = spark.read.parquet(base_path)  # plan/listing setup, not refresh work
    store = spark._jsc.sc().statusStore()

    def jobs() -> int:
        # the status store is fed by an async listener queue — drain it
        # so earlier actions' jobs don't land inside the measured window
        spark._jsc.sc().listenerBus().waitUntilEmpty(10000)
        return store.jobsList(None).size()

    before = jobs()
    r = mv.refresh(base)
    after = jobs()
    assert r["refreshed"] == [] and r["unchanged"] == ["2024-01-01"]
    assert after == before, f"no-op refresh ran {after - before} jobs"


def test_mtmv_write_files_bounded_per_partition(spark, tmp_path, base_path):
    """The salted write distribution (mtmv._distribute_for_write) must
    keep files per partition bounded by the salt fan-out N (default 4):
    salting fixes the 1-task hot-partition write collapse WITHOUT
    reintroducing one-file-per-task spray."""
    import glob

    n = int(os.environ.get("SPARK_GRAFT_MV_WRITE_SALTS", "4"))
    rows = [("2024-01-01", f"t{i}", float(i)) for i in range(200)] + [
        ("2024-01-02", f"t{i}", float(i)) for i in range(50)
    ]
    _write_base(spark, base_path, rows)
    mv = MaterializedView(
        spark, "fb", str(tmp_path / "mvfb"), _definition, "day"
    )
    base = spark.read.parquet(base_path)
    mv.refresh(base)
    for day in ("2024-01-01", "2024-01-02"):
        part_dir = str(tmp_path / "mvfb" / "fb.mv.parquet" / f"day={day}")
        files = glob.glob(os.path.join(part_dir, "*.parquet"))
        assert 1 <= len(files) <= max(n, 1), (day, files)
    _mv_equals_full(mv, base)
