"""Versioned vector store: snapshot reads and time travel over an
append-only parquet log.

The reference mutates its store in place (append-only file, no
history). Production vector stores need the Delta/Iceberg properties —
read any historical snapshot, diff two versions, audit what a commit
changed — without rewriting data. The minimal Spark-native shape:

- every commit APPENDS rows ``(payload..., _version, _op)`` to a
  parquet directory partitioned by ``_version`` — commits never touch
  existing files (object-store friendly, trivially concurrent with
  readers);
- ``read(v)`` folds the log: rows with ``_version <= v``, latest
  version per key wins, tombstones (``_op = 'delete'``) drop. The fold
  is one window over the key — the same shuffle an upsert pays — and
  version partition-pruning keeps a snapshot read from scanning future
  commits;
- ``diff(a, b)`` joins two folded snapshots by key and classifies
  added / removed / changed.

Compaction (folding old versions into a rewritten base to bound the
log's length) is the same ``read(v)`` plan written back out — policy,
not new machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class VersionedStore:
    """Append-only versioned store keyed by ``key_col``."""

    def __init__(
        self, spark: SparkSession, path: str, *, key_col: str = "vec_id"
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col

    # -- log structure ----------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("_version=")
        )

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    # -- writes -----------------------------------------------------------

    def commit(self, df: DataFrame, *, op: str = "upsert") -> int:
        """Append one commit (all rows share the new version). ``op`` is
        'upsert' (insert-or-replace by key) or 'delete' (``df`` needs
        only the key column)."""
        if op not in ("upsert", "delete"):
            raise ValueError(f"op must be 'upsert' or 'delete', got {op!r}")
        v = self.latest_version() + 1
        out = df
        if op == "delete":
            out = df.select(self.key_col)
        (
            out.withColumn("_version", F.lit(v))
            .withColumn("_op", F.lit(op))
            .write.mode("append")
            .partitionBy("_version")
            .parquet(self.path)
        )
        return v

    # -- reads ------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot as of ``version`` (default: latest). The version
        filter prunes parquet partitions, so old snapshots never scan
        newer commits."""
        v = self.latest_version() if version is None else version
        log = self.spark.read.parquet(self.path).filter(
            F.col("_version") <= v
        )
        w = Window.partitionBy(self.key_col).orderBy(
            F.col("_version").desc()
        )
        return (
            log.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col("_op") != "delete"))
            .drop("_rn", "_version", "_op")
        )

    def diff(self, v_a: int, v_b: int) -> DataFrame:
        """Key-level changes from snapshot a to snapshot b:
        (key, change) with change in ('added', 'removed', 'changed').
        'changed' compares the full row payload via a hash of all
        non-key columns."""
        a, b = self.read(v_a), self.read(v_b)
        cols = [c for c in a.columns if c != self.key_col]
        digest = lambda df: df.select(  # noqa: E731
            F.col(self.key_col).alias("key"),
            F.md5(F.to_json(F.struct(*cols))).alias("h"),
        )
        da = digest(a).alias("a")
        db = digest(b).alias("b")
        j = da.join(db, F.col("a.key") == F.col("b.key"), "full_outer")
        change = (
            F.when(F.col("a.key").isNull(), F.lit("added"))
            .when(F.col("b.key").isNull(), F.lit("removed"))
            .when(F.col("a.h") != F.col("b.h"), F.lit("changed"))
        )
        return (
            j.select(
                F.coalesce(F.col("a.key"), F.col("b.key")).alias(
                    self.key_col
                ),
                change.alias("change"),
            )
            .filter(F.col("change").isNotNull())
        )


    def compact(self) -> int:
        """Fold the whole log into one fresh 'upsert' commit of the
        latest snapshot. Append-only discipline holds — old partitions
        stay, so every historical read keeps working. Compaction by
        itself does NOT make reads cheaper (a read at version v still
        scans every partition <= v); what it buys is RETENTION: once no
        reader needs time travel past the compaction point, the
        pre-compaction partitions can be deleted and current reads fold
        the compacted base plus only the commits after it."""
        snap = self.read().localCheckpoint(eager=True)
        return self.commit(snap)
