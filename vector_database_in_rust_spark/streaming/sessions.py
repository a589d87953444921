"""Custom stateful streaming operator: per-user gap sessionization with
``applyInPandasWithState`` — the Structured Streaming twin of
``operators.relational.sessionize_events``.

This is the "custom stateful operator" extension surface (the reference
has no streaming at all, SURVEY.md §2.2): arbitrary per-key state (the
open session) maintained across micro-batches, with event-time timeouts
closing idle sessions.

Scale notes:
- state is one small tuple per ACTIVE user (open session bounds +
  aggregates), not per event — memory ∝ concurrent users;
- the stream shuffles once on user_id (the state key), Arrow-batched
  into Python per key-group;
- idle sessions close via event-time timeout tied to the watermark, so
  state cannot grow without bound on abandoned keys.
"""

from __future__ import annotations

from vector_database_in_rust_spark.streaming import await_or_raise

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT, session_value DOUBLE"
)
STATE_SCHEMA = "start BIGINT, end BIGINT, n BIGINT, v DOUBLE"

GAP_US_DEFAULT = 30 * 60 * 1_000_000


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def sessionize_stateful(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """events (ts TIMESTAMP, user_id, value, ...) -> CLOSED sessions.

    A session closes when a same-user event arrives more than
    ``gap_minutes`` after the previous one, or when the event-time
    timeout fires (watermark passed the gap horizon with no activity).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, end, n, v = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start * 1000)],
                        "session_end": [pd.Timestamp(end * 1000)],
                        "n_events": [n],
                        "session_value": [round(v, 4)],
                    }
                )
            return

        ts_list: list[int] = []
        val_list: list[float] = []
        for pdf in pdfs:
            ts_list.extend(int(t.value // 1000) for t in pdf["ts"])
            val_list.extend(float(x) for x in pdf["value"])
        order = sorted(range(len(ts_list)), key=ts_list.__getitem__)

        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start, end, n, v = state.get
        else:
            start = end = n = 0
            v = 0.0
        for i in order:
            t, x = ts_list[i], val_list[i]
            if n == 0:
                start, end, n, v = t, t, 1, x
            elif t - end > gap_us:
                closed.append((start, end, n, v))
                start, end, n, v = t, t, 1, x
            else:
                # A late-but-within-watermark event may be OLDER than the
                # open session's bounds (t < end, or even t < start when
                # the state predates this batch). Extend with min/max —
                # setting end = t unconditionally would move session_end
                # backwards and cause a spurious split on the next
                # on-time event.
                start, end, n, v = min(start, t), max(end, t), n + 1, v + x
        state.update((start, end, n, v))
        # Close the open session once the watermark passes its gap horizon.
        state.setTimeoutTimestamp((end + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_value": [round(c[3], 4) for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessionize_to_memory(
    spark,
    path: str,
    *,
    table_name: str = "sessions_stream",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    timeout_sec: int = 180,
):
    """Run the stateful sessionizer over a (finite) directory and block
    until all input is processed; closed sessions land in an in-memory
    table. To close the FINAL open session of every user, the input
    directory must end with sentinel "flush" files whose event time is
    far past every real event (see harness.stream_sessionize): the
    watermark then passes every open session's gap horizon and the
    event-time timeouts emit them. Production would writeStream to a
    real sink with a checkpoint dir."""
    from vector_database_in_rust_spark.streaming.events import read_events_stream

    stream = sessionize_stateful(
        read_events_stream(spark, path), gap_minutes=gap_minutes, watermark=watermark
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
