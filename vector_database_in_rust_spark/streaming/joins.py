"""Stream-stream join: clicks correlated with errors inside a bounded
event-time interval, with watermarks on BOTH sides.

Extension surface (the reference has no streaming, SURVEY.md §2.2).
Scale notes: the join state is bounded by watermark + interval — each
side buffers only rows younger than (watermark - interval); keys shuffle
once on user_id. This is the streaming twin of the batch as-of join
(operators/relational.asof_join_events), with interval semantics instead
of carry-forward (stream-stream joins cannot look back unboundedly).
"""

from __future__ import annotations

from vector_database_in_rust_spark.streaming import await_or_raise

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_with_recent_errors(
    events: DataFrame,
    *,
    interval_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Each click joined to every error by the same user within the
    preceding ``interval_minutes``. ``events`` is a streaming DataFrame
    (ts TIMESTAMP, user_id, event_type, event_id)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark)
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("error_ts") <= F.col("click_ts"))
        & (
            F.col("error_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {interval_minutes} MINUTES")
        )
    )
    return clicks.join(errors, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "error_id",
        "error_ts",
    )


def run_join_to_memory(
    spark,
    path: str,
    *,
    table_name: str = "ssj_stream",
    interval_minutes: int = 10,
    timeout_sec: int = 120,
):
    """Run the stream-stream interval join over a (finite) directory to
    completion (availableNow) into an in-memory table. Append mode: a
    stream-stream inner join emits each match exactly once when both
    sides have arrived — with finite input and awaitTermination, the
    result is the full batch join (nothing is late past the watermark).
    """
    from vector_database_in_rust_spark.streaming.events import (
        read_events_stream,
    )

    stream = clicks_with_recent_errors(
        read_events_stream(spark, path), interval_minutes=interval_minutes
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    return spark.table(table_name)
