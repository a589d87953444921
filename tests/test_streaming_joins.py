"""Stream-stream interval join vs the equivalent batch join on the same
static events — every streamed match must be a batch match and vice
versa (watermarks only drop data older than the horizon; with
availableNow over finite input nothing is late)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from vector_database_in_rust_spark.sources.tables import load_table
from vector_database_in_rust_spark.streaming.events import read_events_stream
from vector_database_in_rust_spark.streaming.joins import (
    clicks_with_recent_errors,
)
from tests.conftest import SF_SMOKE


def test_stream_stream_join_matches_batch(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", d / "p.parquet")

    stream = clicks_with_recent_errors(
        read_events_stream(spark, str(d)), interval_minutes=10
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssj")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["click_id"], r["error_id"])
        for r in spark.table("t_ssj").collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    clicks = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    errors = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("eu"), F.col("event_id").alias("eid"),
        F.col("ts").alias("ets"),
    )
    batch = clicks.join(
        errors,
        (F.col("u") == F.col("eu"))
        & (F.col("ets") <= F.col("cts"))
        & (F.col("ets") >= F.col("cts") - F.expr("INTERVAL 10 MINUTES")),
    )
    want = {
        (r["u"], r["cid"], r["eid"]) for r in batch.collect()
    }
    assert got == want
    assert got, "no matches at all — vacuous test"
