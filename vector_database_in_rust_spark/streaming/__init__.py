"""Structured Streaming lane: file-source ingest, watermarked rollups,
sessionization, stream dedup/curation, stream-stream joins.

Every ``run_*_to_memory`` helper drains an ``availableNow`` query and
must fail LOUDLY on timeout: ``awaitTermination(timeout)`` returns False
without raising, and a partially populated memory table would surface
downstream as a confusing hash mismatch instead of a clear error.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def await_or_raise(q: StreamingQuery, timeout_sec: float) -> None:
    """Block until ``q`` terminates; on timeout stop the query and raise
    instead of silently returning a partial result."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not drain within "
            f"{timeout_sec}s (availableNow batch still running)"
        )


def _batch_marker_path(store_path: str, batch_id: int) -> str:
    # Underscore-prefixed dir: Hadoop's hidden-file filter keeps it out
    # of every `spark.read.parquet(store_path)` listing (verified: flat
    # readers see only the root part-files), so the ledger never leaks
    # into the store's read schema.
    return f"{store_path}/_ingest_commits/batch-{int(batch_id)}"


def _marker_fs(spark, store_path: str, batch_id: int):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(_batch_marker_path(store_path, batch_id))
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p


def batch_already_appended(spark, store_path: str, batch_id: int) -> bool:
    """True iff a prior (possibly crashed-and-replayed) run committed
    micro-batch ``batch_id``'s append to ``store_path``. A Hadoop-FS
    existence probe — scheme-agnostic (local/HDFS/object stores via
    their Hadoop connectors) and jobless: per-micro-batch overhead must
    stay in the milliseconds (a read-probe Spark job here measurably
    blew a 32-micro-batch drain past its drain timeout)."""
    fs, p = _marker_fs(spark, store_path, batch_id)
    return bool(fs.exists(p))


def mark_batch_appended(spark, store_path: str, batch_id: int) -> None:
    """Touch the per-batch commit marker (idempotent: overwrite).
    Written AFTER the store append, so the sink is strictly
    at-least-once — a crash between append and marker replays the
    append — but the common retry (failure after the store write,
    before the streaming checkpoint commit) skips the duplicate."""
    fs, p = _marker_fs(spark, store_path, batch_id)
    fs.mkdirs(p.getParent())
    fs.create(p, True).close()
