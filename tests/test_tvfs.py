"""Table-valued functions (sources/tvfs.py) against the sf0.001 fixtures."""

from __future__ import annotations

import os

from doris_spark.sources import tvfs

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_numbers(spark):
    df = tvfs.numbers(spark, 5)
    assert df.columns == ["number"]
    assert [r[0] for r in df.collect()] == [0, 1, 2, 3, 4]


def test_file_and_local(spark):
    p = os.path.join(SF, "region.parquet")
    assert tvfs.file(spark, p).count() == 5
    assert tvfs.local(spark, p, format="parquet").count() == 5


def test_parquet_meta(spark):
    p = os.path.join(SF, "orders.parquet")
    meta = tvfs.parquet_meta(spark, p)
    rows = meta.collect()
    assert len(rows) > 0
    cols = {r["column"] for r in rows}
    assert "o_orderkey" in cols
    ok = [r for r in rows if r["column"] == "o_orderkey"][0]
    assert ok["num_values"] > 0 and ok["min_value"] is not None

    fm = tvfs.parquet_file_metadata(spark, p).collect()[0]
    assert fm["num_rows"] == spark.read.parquet(p).count()
    assert fm["num_row_groups"] >= 1

    kv = tvfs.parquet_kv_metadata(spark, p)
    assert {"file", "key", "value"} <= set(kv.columns)


def test_parquet_bloom_probe(spark):
    p = os.path.join(SF, "orders.parquet")
    hit = tvfs.parquet_bloom_probe(spark, p, "o_orderkey", "1").collect()
    assert all(r["verdict"] in ("may_contain", "must_not_contain") for r in hit)
    assert any(r["verdict"] == "may_contain" for r in hit)
    miss = tvfs.parquet_bloom_probe(spark, p, "o_orderkey", "99999999").collect()
    assert all(r["verdict"] == "must_not_contain" for r in miss)


def test_catalog_system(spark):
    assert tvfs.catalogs(spark).count() >= 1
    be = tvfs.backends(spark).collect()
    assert len(be) == 1 and be[0]["cores"] >= 1 and be[0]["alive"]
    fe = tvfs.frontends(spark).collect()[0]
    assert fe["version"]
    disks = tvfs.frontends_disks(spark).collect()[0]
    assert disks["total_bytes"] > 0
    assert tvfs.mv_infos(spark).columns == ["name", "partition_col", "fresh_partitions"]
    tvfs.jobs(spark)  # shape-only: no active jobs between actions
    tvfs.tasks(spark)


def test_partitions(tmp_path, spark):
    for v in ("2024-01", "2024-02"):
        os.makedirs(tmp_path / f"month={v}", exist_ok=True)
    parts = tvfs.partitions(spark, str(tmp_path)).collect()
    assert [r["value"] for r in parts] == ["2024-01", "2024-02"]
    vals = tvfs.partition_values(spark, str(tmp_path), "month").collect()
    assert {r["value"] for r in vals} == {"2024-01", "2024-02"}


def test_query_passthrough(spark):
    assert tvfs.query(spark, "SELECT 1 + 1 AS x").collect()[0]["x"] == 2
