"""Stateful streaming sessionizer vs the batch sessionizer: every
session the stream CLOSES must match the batch answer exactly (the
stream may additionally hold final still-open sessions in state)."""

from __future__ import annotations

import os
import shutil

import pandas as pd

from vector_database_in_rust_spark.operators.relational import (
    sessionize_events,
)
from vector_database_in_rust_spark.sources.tables import load_table
from vector_database_in_rust_spark.streaming.events import read_events_stream
from vector_database_in_rust_spark.streaming.sessions import (
    sessionize_stateful,
)
from tests.conftest import SF_SMOKE


def test_stateful_sessions_match_batch(spark, tmp_path):
    stream_dir = tmp_path / "ev"
    stream_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", stream_dir / "p.parquet")

    stream = sessionize_stateful(
        read_events_stream(spark, str(stream_dir)), gap_minutes=30
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["session_value"],
        )
        for r in spark.table("t_sessions").collect()
    }

    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["session_value"],
        )
        for r in sessionize_events(
            load_table(spark, SF_SMOKE, "events"), gap_minutes=30
        ).collect()
    }

    # Closed streaming sessions must be a subset of batch sessions with
    # identical aggregates; the difference is exactly the sessions still
    # open (per user, the last one) when input ended.
    assert got, "stream closed no sessions"
    for key, val in got.items():
        assert key in batch, f"stream session {key} not in batch result"
        assert val == batch[key]
    missing = set(batch) - set(got)
    # every user has at most one missing (still-open) session
    per_user = {}
    for k in missing:
        per_user[k[0]] = per_user.get(k[0], 0) + 1
    assert all(v == 1 for v in per_user.values())


def _write_events_file(path, ts_values, mtime):
    """One driver-format events parquet file (ts = int64 nanoseconds);
    mtime ordered so the file stream processes files in sequence."""
    pdf = pd.DataFrame(
        {
            "event_id": range(len(ts_values)),
            "ts": [pd.Timestamp(t).value for (t, _) in ts_values],
            "user_id": [1] * len(ts_values),
            "event_type": ["click"] * len(ts_values),
            "value": [float(v) for (_, v) in ts_values],
            "props": ["{}"] * len(ts_values),
        }
    )
    pdf.to_parquet(path)
    os.utime(path, (mtime, mtime))


def test_late_within_watermark_event_does_not_split_session(spark, tmp_path):
    """Regression: a late-but-within-watermark event OLDER than the open
    session's end must extend bounds with min/max. If it rewound
    session_end, the next on-time event would see a spurious gap and
    split one session into two."""
    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000
    # batch 1: 10:00, 10:25 -> open session end=10:25
    _write_events_file(d / "b1.parquet", [("2024-01-01 10:00", 1), ("2024-01-01 10:25", 2)], base)
    # batch 2: LATE event 10:05 (within the 2h watermark, older than end)
    _write_events_file(d / "b2.parquet", [("2024-01-01 10:05", 4)], base + 100)
    # batch 3: on-time 10:50 — 25 min after the true end (same session);
    # a rewound end (10:05) would see 45 min and split.
    _write_events_file(d / "b3.parquet", [("2024-01-01 10:50", 8)], base + 200)
    # batch 4: 13:00 — real gap, closes the session
    _write_events_file(d / "b4.parquet", [("2024-01-01 13:00", 16)], base + 300)

    from vector_database_in_rust_spark.streaming.events import read_events_stream

    q = (
        sessionize_stateful(read_events_stream(spark, str(d)), gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (str(r["session_start"]), str(r["session_end"]), r["n_events"], r["session_value"])
        for r in spark.table("t_late_sessions").collect()
    ]
    assert got == [("2024-01-01 10:00:00", "2024-01-01 10:50:00", 4, 15.0)]
