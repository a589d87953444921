"""Stateful streaming sessionizer vs the batch sessionizer: every
session the stream CLOSES must match the batch answer exactly (the
stream may additionally hold final still-open sessions in state)."""

from __future__ import annotations

import shutil

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
