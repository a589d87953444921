"""Bucketed range join vs the naive theta join: identical matches on
every bucket-size setting (boundary straddles, interval spans shorter
and longer than the bucket)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.relational import (
    bucketed_range_join,
    derive_time_windows,
    events_in_windows,
)
from vector_database_in_rust_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    df = load_table(spark, SF_SMOKE, "events").cache()
    df.count()
    return df


def _naive(events, windows):
    us = F.unix_micros("ts")
    return events.join(
        windows,
        on=(us >= F.col("w_start_us")) & (us <= F.col("w_end_us")),
        how="inner",
    )


@pytest.mark.parametrize("bucket_minutes", [7, 60, 360, 100_000])
def test_bucketed_equals_naive_theta(spark, events, bucket_minutes):
    """Bucket granularity must not change the result: tiny buckets
    (interval spans many), huge buckets (many intervals share one)."""
    windows = derive_time_windows(events, n_windows=10).cache()
    want = sorted(
        (r["event_id"], r["window_id"])
        for r in _naive(events, windows).select("event_id", "window_id").collect()
    )
    got = sorted(
        (r["event_id"], r["window_id"])
        for r in bucketed_range_join(
            events, windows, bucket_minutes=bucket_minutes
        )
        .select("event_id", "window_id")
        .collect()
    )
    assert got == want and want, "range join results differ (or vacuous)"


def test_events_in_windows_nonempty(spark, events):
    rows = events_in_windows(events, n_windows=24).collect()
    assert rows
    assert all(r["n_events"] > 0 for r in rows)
