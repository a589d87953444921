"""Timestamp-representation contract for the ingest layer.

The driver has shipped `ts` in more than one physical parquet encoding
across rounds (TIMESTAMP(NANOS) -> read as int64 under nanosAsLong;
plain timestamp[us] -> read as TIMESTAMP_NTZ). The Spark analogue of the
reference's reject-or-normalize open check (``MmapVectorStore::open``,
src/disk_store.rs:22-27) is ``sources.tables.canonicalize_timestamps``:
whatever the file encodes, the loaded column is session-zoned TIMESTAMP
under a UTC-pinned session, identical instants in every encoding, and
``unix_micros`` never throws.

These tests write the SAME logical rows in each physical encoding and
assert batch loader, epoch math, and the streaming reader all agree.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.sources.tables import load_table

TS_VALUES = [
    dt.datetime(2024, 3, 1, 0, 0, 0),
    dt.datetime(2024, 3, 1, 12, 34, 56, 789012),
    dt.datetime(2024, 12, 31, 23, 59, 59, 999999),
]
def _naive_epoch_us(t: dt.datetime) -> int:
    delta = t - dt.datetime(1970, 1, 1)
    return (delta.days * 86400 + delta.seconds) * 1_000_000 + delta.microseconds


EXPECTED_US = [_naive_epoch_us(t) for t in TS_VALUES]


def _write_events(dirpath, ts_array: pa.Array) -> None:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, str(dirpath / "events.parquet"))


ENCODINGS = {
    "nanos": pa.array(TS_VALUES, pa.timestamp("ns")),  # old driver: TIMESTAMP(NANOS)
    "micros_ntz": pa.array(TS_VALUES, pa.timestamp("us")),  # current driver
    "micros_utc": pa.array(TS_VALUES, pa.timestamp("us", tz="UTC")),
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_batch_loader_canonicalizes(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(d, ENCODINGS[enc])
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r["us"]
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == EXPECTED_US


def test_all_encodings_identical(spark, tmp_path):
    results = {}
    for enc, arr in ENCODINGS.items():
        d = tmp_path / enc
        d.mkdir()
        _write_events(d, arr)
        df = load_table(spark, str(d), "events")
        results[enc] = sorted(
            (r["event_id"], r["us"])
            for r in df.select(
                "event_id", F.unix_micros("ts").alias("us")
            ).collect()
        )
    vals = list(results.values())
    assert all(v == vals[0] for v in vals[1:])


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_stream_reader_matches_batch(spark, tmp_path, enc):
    from vector_database_in_rust_spark.streaming.events import read_events_stream

    d = tmp_path / enc
    d.mkdir()
    _write_events(d, ENCODINGS[enc])
    stream = read_events_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    name = f"loader_contract_{enc}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        (r["event_id"], r["us"])
        for r in spark.table(name)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .collect()
    )
    assert got == [(1, EXPECTED_US[0]), (2, EXPECTED_US[1]), (3, EXPECTED_US[2])]


def test_sentinel_writer_matches_source_schema(tmp_path):
    """_write_parquet_like must reproduce the source's physical ts type."""
    from vector_database_in_rust_spark.harness import _write_parquet_like

    for enc, arr in ENCODINGS.items():
        d = tmp_path / enc
        d.mkdir()
        _write_events(d, arr)
        out = d / "sentinel.parquet"
        _write_parquet_like(
            str(d / "events.parquet"),
            str(out),
            {
                "event_id": [-1],
                "ts": [dt.datetime(2100, 1, 1)],
                "user_id": [-1],
                "event_type": ["flush"],
                "value": [0.0],
                "props": ["{}"],
            },
        )
        src = pq.read_schema(str(d / "events.parquet"))
        got = pq.read_schema(str(out))
        assert [
            (got.field(i).name, got.field(i).type) for i in range(len(got.names))
        ] == [(src.field(i).name, src.field(i).type) for i in range(len(src.names))]


def test_raw_int64_nanos_encoding(spark, tmp_path):
    """A RAW (unannotated) INT64 epoch-nanos ts column — the loader's
    bigint branch — must canonicalize identically, and the sentinel
    writer must emit NANOS for it (a plain timestamp->int64 cast would
    be 1000x off)."""
    d = tmp_path / "rawns"
    d.mkdir()
    _write_events(
        d, pa.array([_naive_epoch_us(t) * 1000 for t in TS_VALUES], pa.int64())
    )
    df = load_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(
        r["us"] for r in df.select(F.unix_micros("ts").alias("us")).collect()
    )
    assert got == EXPECTED_US

    from vector_database_in_rust_spark.harness import _write_parquet_like

    out = d / "sentinel.parquet"
    _write_parquet_like(
        str(d / "events.parquet"),
        str(out),
        {
            "event_id": [-1],
            "ts": [dt.datetime(2100, 1, 1)],
            "user_id": [-1],
            "event_type": ["flush"],
            "value": [0.0],
            "props": ["{}"],
        },
    )
    tbl = pq.read_table(str(out))
    assert tbl.schema.field("ts").type == pa.int64()
    want_ns = _naive_epoch_us(dt.datetime(2100, 1, 1)) * 1000
    assert tbl.column("ts").to_pylist() == [want_ns]


def test_staging_is_crash_safe(spark, tmp_path, monkeypatch):
    """A process killed mid-stage must NOT poison the stage dir: builds
    run in a temp sibling and publish atomically via rename, so a crash
    leaves NO stage directory at all (and no temp litter), and the next
    call rebuilds cleanly."""
    import os
    import pathlib

    from vector_database_in_rust_spark.harness import _ensure_staged

    stage = str(tmp_path / "stage")
    calls = []

    def crashing_build(d):
        calls.append("crash")
        (pathlib.Path(d) / "partial.txt").write_text("half")
        raise RuntimeError("killed mid-stage")

    with pytest.raises(RuntimeError):
        _ensure_staged(stage, crashing_build)
    # atomic publish: the half-written build never becomes visible
    assert not os.path.exists(stage)
    assert not any(p.name.startswith("stage.tmp") for p in tmp_path.iterdir())

    def good_build(d):
        calls.append("good")
        (pathlib.Path(d) / "real.txt").write_text("all")

    _ensure_staged(stage, good_build)
    assert not os.path.exists(os.path.join(stage, "partial.txt"))
    assert os.path.exists(os.path.join(stage, "real.txt"))
    assert os.path.exists(os.path.join(stage, "_STAGED"))
    # a third call is a no-op
    _ensure_staged(stage, good_build)
    assert calls == ["crash", "good"]


def test_staging_loser_defers_to_published_stage(tmp_path):
    """Two processes racing the same content-hash key: if another
    builder publishes the stage while ours is mid-build, our rename
    loses and our temp is discarded — the winner's files survive
    untouched (both builds are content-identical by key construction,
    so deferring is correct)."""
    import os
    import pathlib

    from vector_database_in_rust_spark.harness import _ensure_staged

    stage = str(tmp_path / "stage")

    def racing_build(d):
        # simulate the OTHER process winning while we build
        os.makedirs(stage)
        (pathlib.Path(stage) / "winner.txt").write_text("w")
        open(os.path.join(stage, "_STAGED"), "w").close()
        (pathlib.Path(d) / "loser.txt").write_text("l")

    _ensure_staged(stage, racing_build)
    assert os.path.exists(os.path.join(stage, "winner.txt"))
    assert not os.path.exists(os.path.join(stage, "loser.txt"))
    assert not any(p.name.startswith("stage.tmp") for p in tmp_path.iterdir())
