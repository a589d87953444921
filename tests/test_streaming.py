"""Streaming/batch reconciliation: the watermarked streaming rollup over
the static events parquet must agree with the batch rollup on every
(hour, event_type) group (Kappa-architecture check)."""

from __future__ import annotations

from vector_database_in_rust_spark.operators.relational import (
    events_hourly_rollup,
)
from vector_database_in_rust_spark.sources.tables import load_table
from vector_database_in_rust_spark.streaming.events import (
    run_rollup_to_memory,
)
from tests.conftest import SF_SMOKE


def test_stream_rollup_matches_batch(spark, tmp_path):
    batch = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly_rollup(
            load_table(spark, SF_SMOKE, "events")
        ).collect()
    }
    # The file stream source requires a directory.
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", stream_dir / "events.parquet")
    stream = run_rollup_to_memory(
        spark, str(stream_dir), table_name="t_rollup"
    )
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream.collect()
    }
    assert got == batch
