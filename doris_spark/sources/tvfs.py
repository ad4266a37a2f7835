"""Table-valued functions (BuiltinTableValuedFunctions.java, 25 names).

Each Doris TVF maps to a function (spark, ...) -> DataFrame here; the
FROM-clause spelling `SELECT * FROM numbers(...)` works through the UDTF
registrations in functions/tvf.py where rows are generated, and through
these wrappers where the TVF is really a reader or catalog inspector.

Tiers:
- file sources (file/local/s3/hdfs/http_stream): thin `spark.read`
  wrappers — scheme goes in the path (s3a://, hdfs://), format inferred
  from the uri or passed explicitly. The reference's property-map
  arguments (fe/.../tablefunction/FileTableValuedFunction) become
  keyword args.
- parquet inspectors (parquet_meta / parquet_file_metadata /
  parquet_kv_metadata / parquet_bloom_probe): pyarrow-backed readers of
  footer, row-group zone maps (min/max/nulls — the OlapScan zone-map
  analog made queryable), key-value metadata, and bloom-filter presence.
  Driver-side listing, executor-free: metadata only, never data.
- catalog/system (catalogs, partitions, partition_values, jobs, tasks,
  backends, frontends, frontends_disks, mv_infos): Spark catalog and
  scheduler introspection shaped like the reference's result sets.
- query(sql): passthrough to this session (for external JDBC systems use
  sources/external.read_jdbc_scan — the reference's query() targets a
  JDBC catalog too).
- binlog / cdc_stream / group_commit: streaming-ingest surface —
  streaming/ingest.py and the CDC non-goal note in COVERAGE.md §2.11.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession


def numbers(spark: SparkSession, number: int, backend_num: int | None = None) -> DataFrame:
    """Doris numbers("number"="N") — spark.range with the Doris column
    name. Distributed generation (DataGen scan), not a driver loop."""
    return spark.range(int(number)).withColumnRenamed("id", "number")


def _read(spark: SparkSession, uri: str, fmt: str | None, **options) -> DataFrame:
    if fmt is None:
        ext = os.path.splitext(uri.rstrip("/*"))[1].lstrip(".").lower()
        fmt = {"csv": "csv", "tsv": "csv", "json": "json", "jsonl": "json", "orc": "orc"}.get(
            ext, "parquet"
        )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(uri)


def file(spark: SparkSession, uri: str, format: str | None = None, **options) -> DataFrame:
    """Generic file TVF — uri carries the scheme (file:/, s3a://, hdfs://)."""
    return _read(spark, uri, format, **options)


def local(spark: SparkSession, path: str, format: str | None = None, **options) -> DataFrame:
    return _read(spark, path, format, **options)


def s3(spark: SparkSession, uri: str, format: str | None = None, **options) -> DataFrame:
    """S3 TVF: accepts s3://... (rewritten to s3a:// for the Hadoop
    connector). Credentials come from the session's Hadoop conf."""
    return _read(spark, uri.replace("s3://", "s3a://", 1), format, **options)


def hdfs(spark: SparkSession, uri: str, format: str | None = None, **options) -> DataFrame:
    return _read(spark, uri, format, **options)


def http(spark: SparkSession, url: str, format: str | None = None, **options) -> DataFrame:
    return http_stream(spark, url, format, **options)


def http_stream(spark: SparkSession, url: str, format: str | None = None, **options) -> DataFrame:
    """The reference's http_stream pulls a URL server-side. Spark has no
    HTTP filesystem by default; SparkContext.addFile + local read covers
    the bounded case."""
    from pyspark import SparkFiles

    spark.sparkContext.addFile(url)
    return _read(spark, "file://" + SparkFiles.get(os.path.basename(url)), format, **options)


# ------------------------------------------------------- parquet inspectors


def _pq_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "*.parquet")))
    return sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]


def parquet_meta(spark: SparkSession, path: str) -> DataFrame:
    """Row-group column chunk zone maps: min/max/null_count/num_values per
    (file, row_group, column) — the queryable form of the reference's
    zone-map index (be/src/storage/index/zone_map)."""
    import pyarrow.parquet as pq

    rows = []
    for f in _pq_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                st = c.statistics
                rows.append(
                    (
                        os.path.basename(f),
                        rg,
                        c.path_in_schema,
                        str(c.physical_type),
                        c.num_values,
                        c.total_compressed_size,
                        c.total_uncompressed_size,
                        None if st is None else str(st.min) if st.has_min_max else None,
                        None if st is None else str(st.max) if st.has_min_max else None,
                        None if st is None else st.null_count,
                    )
                )
    return spark.createDataFrame(
        rows,
        "file string, row_group int, column string, physical_type string, "
        "num_values long, compressed_bytes long, uncompressed_bytes long, "
        "min_value string, max_value string, null_count long",
    )


def parquet_file_metadata(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for f in _pq_files(path):
        md = pq.ParquetFile(f).metadata
        rows.append(
            (
                os.path.basename(f),
                md.num_rows,
                md.num_row_groups,
                md.num_columns,
                str(md.created_by),
                md.format_version,
            )
        )
    return spark.createDataFrame(
        rows,
        "file string, num_rows long, num_row_groups int, num_columns int, "
        "created_by string, format_version string",
    )


def parquet_kv_metadata(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow.parquet as pq

    rows = []
    for f in _pq_files(path):
        kv = pq.ParquetFile(f).metadata.metadata or {}
        for k, v in kv.items():
            rows.append(
                (
                    os.path.basename(f),
                    k.decode("utf-8", "replace"),
                    v.decode("utf-8", "replace")[:1000],
                )
            )
    return spark.createDataFrame(rows, "file string, key string, value string")


def parquet_bloom_probe(spark: SparkSession, path: str, column: str, value: str) -> DataFrame:
    """Which row groups could contain `value` per the column statistics
    (bloom filters are not exposed by this pyarrow build; min/max zone
    maps give the same may-contain/must-not-contain verdict shape)."""
    import pyarrow.parquet as pq

    rows = []
    for f in _pq_files(path):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            verdict = "may_contain"
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == column and c.statistics and c.statistics.has_min_max:
                    st = c.statistics
                    try:
                        typed = type(st.min)(value)
                        if typed < st.min or typed > st.max:
                            verdict = "must_not_contain"
                    except (ValueError, TypeError):
                        pass
            rows.append((os.path.basename(f), rg, column, value, verdict))
    return spark.createDataFrame(
        rows, "file string, row_group int, column string, probe_value string, verdict string"
    )


# ---------------------------------------------------------- catalog/system


def catalogs(spark: SparkSession) -> DataFrame:
    rows = [(c.name, c.description or "") for c in spark.catalog.listCatalogs()]
    return spark.createDataFrame(rows, "catalog_name string, comment string")


def partitions(spark: SparkSession, path: str) -> DataFrame:
    """Hive-style partition directories of a dataset path (k=v segments)."""
    rows = []
    for entry in sorted(_glob.glob(os.path.join(path, "*"))):
        base = os.path.basename(entry)
        if os.path.isdir(entry) and "=" in base:
            k, v = base.split("=", 1)
            rows.append((base, k, v))
    return spark.createDataFrame(rows, "partition string, key string, value string")


def partition_values(spark: SparkSession, path: str, key: str) -> DataFrame:
    parts = partitions(spark, path)
    return parts.filter(parts.key == key).select("value").distinct()


def jobs(spark: SparkSession) -> DataFrame:
    tracker = spark.sparkContext.statusTracker()
    rows = []
    for jid in tracker.getJobIdsForGroup(None) or []:
        info = tracker.getJobInfo(jid)
        if info:
            rows.append((jid, str(info.status), list(info.stageIds)))
    return spark.createDataFrame(rows or [], "job_id int, status string, stage_ids array<int>")


def tasks(spark: SparkSession) -> DataFrame:
    tracker = spark.sparkContext.statusTracker()
    rows = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info:
            rows.append((sid, info.name, info.numTasks, info.numActiveTasks, info.numCompletedTasks))
    return spark.createDataFrame(
        rows or [],
        "stage_id int, name string, num_tasks int, active_tasks int, completed_tasks int",
    )


def backends(spark: SparkSession) -> DataFrame:
    """Executor inventory — the BE list analog. local[N] shows the driver
    as its single 'backend' with N cores."""
    sc = spark.sparkContext
    mem = sc.getConf().get("spark.driver.memory", "")
    rows = [(0, "driver", sc.defaultParallelism, mem, True)]
    return spark.createDataFrame(
        rows, "backend_id int, host string, cores int, memory string, alive boolean"
    )


def frontends(spark: SparkSession) -> DataFrame:
    sc = spark.sparkContext
    return spark.createDataFrame(
        [(sc.applicationId, sc.master, sc.version, True)],
        "name string, host string, version string, is_master boolean",
    )


def frontends_disks(spark: SparkSession) -> DataFrame:
    import shutil

    du = shutil.disk_usage("/")
    return spark.createDataFrame(
        [("driver", "/", du.total, du.used, du.free)],
        "name string, dir string, total_bytes long, used_bytes long, free_bytes long",
    )


def mv_infos(spark: SparkSession) -> DataFrame:
    """Materialized views registered through streaming/mtmv.py."""
    from doris_spark.streaming import mtmv as _mtmv

    regs = getattr(_mtmv, "REGISTRY", {})
    rows = [(name, mv.partition_col, len(mv.known_fingerprints())) for name, mv in regs.items()]
    return spark.createDataFrame(
        rows or [], "name string, partition_col string, fresh_partitions int"
    )


def query(spark: SparkSession, sql_text: str) -> DataFrame:
    """query() passthrough: runs against this session (Doris's query()
    targets a JDBC catalog — use sources/external.read_jdbc_scan there)."""
    return spark.sql(sql_text)
