"""Schema-change jobs (plans/schema_change.py): ALTER TABLE
ADD/DROP/MODIFY/RENAME COLUMN over file-backed catalog tables and
view-backed keys-model tables.

Reference: fe SchemaChangeHandler (light schema change) +
be/src/storage/schema_change/schema_change.cpp (direct schema change =
tablet rewrite + atomic swap). The gates here pin the two scale
behaviors: NULL-default ADD is metadata-only (data files untouched),
and the direct path rewrites distributedly while preserving partition
layout.
"""

from __future__ import annotations

import os

import pytest

from doris_spark.engine import Engine


def _files(base, sub=""):
    d = os.path.join(base, sub) if sub else base
    out = []
    for root, _dirs, fs in os.walk(d):
        for f in fs:
            if f.startswith(("_", ".")):
                continue
            p = os.path.join(root, f)
            out.append((os.path.relpath(p, d), os.path.getmtime(p),
                        os.path.getsize(p)))
    return sorted(out)


@pytest.fixture()
def eng(spark):
    return Engine(spark)


def test_add_column_null_default_is_metadata_only(spark, eng, tmp_path):
    spark.sql("DROP TABLE IF EXISTS sc_add_t")
    spark.sql(
        "CREATE TABLE sc_add_t (id INT, val DOUBLE) USING parquet "
        f"LOCATION '{tmp_path}/sc_add_t'"
    )
    spark.sql("INSERT INTO sc_add_t VALUES (1, 1.5), (2, 2.5)")
    before = _files(str(tmp_path), "sc_add_t")
    eng.sql("ALTER TABLE sc_add_t ADD COLUMN note VARCHAR(32)")
    after = _files(str(tmp_path), "sc_add_t")
    assert after == before, "NULL-default ADD COLUMN must not rewrite data"
    got = sorted(tuple(r) for r in spark.table("sc_add_t").collect())
    assert got == [(1, 1.5, None), (2, 2.5, None)]
    spark.sql("DROP TABLE sc_add_t")


def test_add_column_with_default_backfills(spark, eng, tmp_path):
    spark.sql("DROP TABLE IF EXISTS sc_def_t")
    spark.sql(
        "CREATE TABLE sc_def_t (id INT) USING parquet "
        f"LOCATION '{tmp_path}/sc_def_t'"
    )
    spark.sql("INSERT INTO sc_def_t VALUES (1), (2)")
    eng.sql('ALTER TABLE sc_def_t ADD COLUMN status VARCHAR(8) DEFAULT "new"')
    got = sorted(tuple(r) for r in spark.table("sc_def_t").collect())
    assert got == [(1, "new"), (2, "new")]
    # numeric default + AFTER position
    eng.sql("ALTER TABLE sc_def_t ADD COLUMN score INT DEFAULT 7 AFTER id")
    assert spark.table("sc_def_t").columns == ["id", "score", "status"]
    got = sorted(tuple(r) for r in spark.table("sc_def_t").collect())
    assert got == [(1, 7, "new"), (2, 7, "new")]
    spark.sql("DROP TABLE sc_def_t")


def test_drop_and_modify_and_rename(spark, eng, tmp_path):
    spark.sql("DROP TABLE IF EXISTS sc_dmr_t")
    spark.sql(
        "CREATE TABLE sc_dmr_t (id INT, a STRING, b INT) USING parquet "
        f"LOCATION '{tmp_path}/sc_dmr_t'"
    )
    spark.sql("INSERT INTO sc_dmr_t VALUES (1, 'x', 10), (2, 'y', 20)")
    eng.sql("ALTER TABLE sc_dmr_t DROP COLUMN a")
    assert spark.table("sc_dmr_t").columns == ["id", "b"]
    # MODIFY: INT -> BIGINT type converter (direct schema change)
    eng.sql("ALTER TABLE sc_dmr_t MODIFY COLUMN b BIGINT")
    assert dict(spark.table("sc_dmr_t").dtypes)["b"] == "bigint"
    got = sorted(tuple(r) for r in spark.table("sc_dmr_t").collect())
    assert got == [(1, 10), (2, 20)]
    eng.sql("ALTER TABLE sc_dmr_t RENAME COLUMN b amount")
    assert spark.table("sc_dmr_t").columns == ["id", "amount"]
    spark.sql("DROP TABLE sc_dmr_t")


def test_rewrite_preserves_partition_layout(spark, eng, tmp_path):
    spark.sql("DROP TABLE IF EXISTS sc_part_t")
    spark.sql(
        "CREATE TABLE sc_part_t (id INT, val DOUBLE, day STRING) "
        "USING parquet PARTITIONED BY (day) "
        f"LOCATION '{tmp_path}/sc_part_t'"
    )
    spark.sql(
        "INSERT INTO sc_part_t VALUES (1, 1.0, 'd1'), (2, 2.0, 'd2')"
    )
    eng.sql("ALTER TABLE sc_part_t MODIFY COLUMN val DECIMAL(10,2)")
    # partition pruning still plans on `day` after the swap
    df = spark.table("sc_part_t").filter("day = 'd1'")
    assert [tuple(r) for r in df.collect()] == [(1, 1.00, "d1")] or [
        (r[0], float(r[1]), r[2]) for r in df.collect()
    ] == [(1, 1.0, "d1")]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "day" in plan
    # dropping / modifying a partition column is rejected
    with pytest.raises(ValueError, match="partition column"):
        eng.sql("ALTER TABLE sc_part_t DROP COLUMN day")
    spark.sql("DROP TABLE sc_part_t")


def test_view_backed_keys_table(spark, eng):
    df = spark.createDataFrame(
        [(1, "a", 5), (1, "a", 9), (2, "b", 3)], "k INT, tag STRING, ver INT"
    )
    eng.create_table(df, "sc_uk_t", keys_type="UNIQUE_KEYS", keys=["k"],
                     sequence_col="ver")
    eng.sql("ALTER TABLE sc_uk_t ADD COLUMN flag BOOLEAN DEFAULT NULL")
    got = sorted(tuple(r) for r in eng.table("sc_uk_t").collect())
    assert got == [(1, "a", 9, None), (2, "b", 3, None)]
    # key column cannot be dropped (sort/merge schema)
    with pytest.raises(ValueError, match="key column"):
        eng.sql("ALTER TABLE sc_uk_t DROP COLUMN k")
    eng.sql("ALTER TABLE sc_uk_t DROP COLUMN flag")
    assert eng.table("sc_uk_t").columns == ["k", "tag", "ver"]
    # rename a key column: meta follows, upsert keeps working
    eng.sql("ALTER TABLE sc_uk_t RENAME COLUMN k pk")
    eng.sql("INSERT INTO sc_uk_t VALUES (1, 'z', 11)")
    got = sorted(tuple(r) for r in eng.table("sc_uk_t").collect())
    assert got == [(1, "z", 11), (2, "b", 3)]


def test_multi_add_parenthesized(spark, eng, tmp_path):
    spark.sql("DROP TABLE IF EXISTS sc_multi_t")
    spark.sql(
        "CREATE TABLE sc_multi_t (id INT) USING parquet "
        f"LOCATION '{tmp_path}/sc_multi_t'"
    )
    spark.sql("INSERT INTO sc_multi_t VALUES (1)")
    eng.sql("ALTER TABLE sc_multi_t ADD COLUMN (c1 INT, c2 DATETIME)")
    assert spark.table("sc_multi_t").columns == ["id", "c1", "c2"]
    assert dict(spark.table("sc_multi_t").dtypes)["c2"] == "timestamp"
    spark.sql("DROP TABLE sc_multi_t")
