"""Streaming row-level dedup under at-least-once delivery: the output
must carry each event EXACTLY once no matter how many times the input
was delivered, in both state regimes (unbounded keys-seen and
watermark-bounded)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_database_in_rust_spark.streaming.dedup import (
    dedup_stream_bounded,
    run_redelivery_dedup_to_memory,
)
from vector_database_in_rust_spark.streaming.events import read_events_stream


@pytest.fixture()
def staged_twice(tmp_path):
    """The same events file delivered twice — simulated replay."""
    stage = tmp_path / "redelivery"
    stage.mkdir()
    src = f"{SF_SMOKE}/events.parquet"
    shutil.copy(src, stage / "delivery_1.parquet")
    shutil.copy(src, stage / "delivery_2.parquet")
    return str(stage)


def _batch_events(spark):
    from vector_database_in_rust_spark.harness import load_table

    return load_table(spark, SF_SMOKE, "events")


def test_redelivery_dedup_reconstructs_original(spark, staged_twice):
    """Double delivery -> exact streaming dedup -> the original event
    set, row-identical on every column."""
    out = run_redelivery_dedup_to_memory(
        spark, staged_twice, table_name="t_dedup_exact"
    )
    batch = _batch_events(spark)
    assert out.count() == batch.count()
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    diff = out.select(*cols).exceptAll(batch.select(*cols))
    assert diff.count() == 0


def test_bounded_dedup_exactly_once_under_replay(spark, staged_twice):
    """The watermark-bounded variant: every replayed row is either a
    within-horizon duplicate (dropped by state) or older than the
    horizon (dropped as late) — the output is exactly-once in BOTH
    watermark regimes."""
    batch_n = _batch_events(spark).count()
    for i, wm in enumerate(("100 days", "0 seconds")):
        deduped = dedup_stream_bounded(
            read_events_stream(spark, staged_twice), ["event_id"], watermark=wm
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"t_dedup_wm_{i}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table(f"t_dedup_wm_{i}")
        assert got.count() == batch_n, f"watermark={wm}"
        assert got.select("event_id").distinct().count() == batch_n


def test_harness_entry_matches_batch(spark):
    """Driver-run shape: the harness projection over the deduped stream
    equals the same projection over the batch table."""
    from vector_database_in_rust_spark import harness

    got = harness.QUERIES["stream_dedup_redelivery"](spark, SF_SMOKE)
    want = _batch_events(spark).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
