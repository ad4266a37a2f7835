"""MTMV — async materialized view with PARTITION-LEVEL incremental refresh.

Reference: fe/fe-core/.../mtmv/ (MTMVPartitionUtil.java tracks which MV
partitions are stale against base-table partition versions;
MTMVRefreshSnapshot.java stores the per-partition version snapshot;
refresh recomputes ONLY stale partitions). The scheduled trigger
(MTMVJobManager.java) is orchestrator scope — this module is the refresh
engine a scheduler would call.

Spark-first mapping:
- MV storage is a parquet table partitioned by the MV's partition column;
  `spark.sql.sources.partitionOverwriteMode=dynamic` makes a refresh of
  the stale slice replace exactly those partitions — Doris's
  partition-level replace, natively.
- The snapshot is a per-partition content fingerprint (count + an
  order-independent sum of per-row hashes), computed in ONE aggregate scan
  of the base table. Doris uses storage-engine partition versions; a
  content fingerprint is the lake-storage equivalent (works for any base,
  including overwrites that don't bump a version counter).
- Stale-partition recompute filters the base on the partition column, so
  partition pruning keeps the refresh cost proportional to the CHANGED
  data, not the table (at 100 TB this is the whole point: a day's refresh
  reads a day, not the history).

Definitions must be partition-local: the MV query may aggregate freely
WITHIN a partition value but must not mix rows across partition values
(same restriction Doris imposes for partition-incremental MTMVs —
"partition roll-up" MVs refresh at the base partition granularity).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MaterializedView:
    """A partition-incrementally-refreshable materialized view.

    Parameters
    ----------
    definition : base DataFrame -> MV DataFrame. Must keep `partition_col`
        in its output and must be partition-local (see module docstring).
    """

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        storage_dir: str,
        definition: Callable[[DataFrame], DataFrame],
        partition_col: str,
    ) -> None:
        self.spark = spark
        self.name = name
        self.storage_dir = storage_dir
        self.definition = definition
        self.partition_col = partition_col
        self.data_path = os.path.join(storage_dir, f"{name}.mv.parquet")
        self.snapshot_path = os.path.join(storage_dir, f"{name}.snapshot.json")

    # ---- snapshot (MTMVRefreshSnapshot analog) -------------------------

    def _fingerprints(self, base: DataFrame) -> dict[str, list[int]]:
        """One scan: per-partition (row_count, order-independent content
        hash). xxhash64 over the full row struct, summed — commutative, so
        insert order / file layout never matter."""
        # pmod keeps each term < 2^30, so the BIGINT sum is overflow-safe
        # (ANSI mode throws on overflow) up to ~2^33 rows per partition.
        rows = (
            base.groupBy(self.partition_col)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.pmod(F.xxhash64(F.struct(*base.columns)), F.lit(1_000_000_007))
                ).alias("h"),
            )
            .collect()
        )
        return {str(r[0]): [r["n"], int(r["h"])] for r in rows}

    def _load_snapshot(self) -> dict[str, list[int]]:
        if not os.path.exists(self.snapshot_path):
            return {}
        with open(self.snapshot_path) as f:
            return json.load(f)

    def _save_snapshot(self, snap: dict[str, list[int]]) -> None:
        os.makedirs(self.storage_dir, exist_ok=True)
        tmp = self.snapshot_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self.snapshot_path)

    # ---- refresh (MTMVPartitionUtil.getPartitionsToRefresh analog) -----

    def refresh(self, base: DataFrame) -> dict[str, list[str]]:
        """Bring the MV up to date. Returns which partitions were
        refreshed / dropped / unchanged (the observable contract the
        tests pin — Doris reports the same in its refresh task log)."""
        current = self._fingerprints(base)
        previous = self._load_snapshot()
        stale = sorted(p for p, fp in current.items() if previous.get(p) != fp)
        dropped = sorted(p for p in previous if p not in current)
        unchanged = sorted(p for p in current if p not in stale)

        if stale:
            # Partition pruning: only the changed base slice is read.
            slice_df = base.filter(F.col(self.partition_col).cast("string").isin(stale))
            out = self.definition(slice_df)
            if self.partition_col not in out.columns:
                raise ValueError(
                    f"MV definition must retain partition column {self.partition_col!r}"
                )
            saved = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (
                    out.write.mode("overwrite")
                    .partitionBy(self.partition_col)
                    .parquet(self.data_path)
                )
            finally:
                self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", saved)

        # Dropped base partitions: remove the MV-side partition dirs.
        for p in dropped:
            import shutil

            pdir = os.path.join(self.data_path, f"{self.partition_col}={p}")
            if os.path.exists(pdir):
                shutil.rmtree(pdir)

        self._save_snapshot(current)
        return {"refreshed": stale, "dropped": dropped, "unchanged": unchanged}

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.data_path)
