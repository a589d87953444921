"""Streaming row-level deduplication: at-least-once delivery repair.

The reference is strictly batch and assumes its input is already unique
(mock_data.py writes each id once); real ingestion pipelines get
AT-LEAST-ONCE delivery — replays, retried producers, doubled files —
and must repair duplicates BEFORE anything downstream aggregates them.
This module is the streaming twin of ``operators.dedup.dedup_exact``:
same "exactly one survivor per key" contract, computed incrementally.

Two state regimes, chosen by what bounds the duplicate horizon:

- ``dedup_stream_exact``: ``dropDuplicates`` on the key — state holds
  every key seen since the query started. Correct for run-to-completion
  backfills (``availableNow`` over a finite directory) and for streams
  whose key space is bounded; on an unbounded 100 TB stream the state
  grows forever, which is why the watermarked variant exists.
- ``dedup_stream_bounded``: ``dropDuplicatesWithinWatermark`` — state
  holds only keys younger than the watermark horizon, the Spark-native
  bounded-memory shape. Duplicates arriving WITHIN the horizon are
  dropped as duplicates; rows older than the horizon are dropped as
  late data. Under replay (the common failure: a whole file or
  partition re-delivered) every replayed row is one or the other, so
  the output stream carries each event exactly once either way.

State is hash-partitioned by the dedup key — the same shuffle an exact
batch dedup pays, amortized per micro-batch; no driver-side state.
"""

from __future__ import annotations

from vector_database_in_rust_spark.streaming import await_or_raise

from pyspark.sql import DataFrame, SparkSession

from vector_database_in_rust_spark.streaming.events import read_events_stream


def dedup_stream_exact(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exactly one survivor per key; unbounded keys-seen state (use for
    finite backfills or bounded key spaces — see module docstring)."""
    return stream.dropDuplicates(key_cols)


def dedup_stream_bounded(
    stream: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly one survivor per key within the watermark horizon;
    state is bounded by the horizon — the unbounded-stream shape."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def run_redelivery_dedup_to_memory(
    spark: SparkSession,
    staged_dir: str,
    *,
    table_name: str = "dedup_stream",
    timeout_sec: int = 120,
):
    """Drain a (finite) directory that simulates at-least-once delivery
    — the same events file staged more than once — through the exact
    streaming dedup on event_id; results land in an in-memory table.
    The contract: the output is EXACTLY the original event set, no
    matter how many times the input was delivered."""
    deduped = dedup_stream_exact(
        read_events_stream(spark, staged_dir), ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    return spark.table(table_name)
