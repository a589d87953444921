"""Streaming curation semantics beyond the driver's redelivery
reconciliation: cross-micro-batch dedup state and gate behavior."""

from __future__ import annotations

import os

from vector_database_in_rust_spark.streaming.curate import (
    run_curate_stream_to_memory,
)

GOOD_A = " ".join(f"a{i}" for i in range(150)) + " the of and to in is it " * 3
GOOD_B = " ".join(f"b{i}" for i in range(150)) + " the of and to in is it " * 3


def _write(spark, path, rows):
    """Stage one PLAIN parquet file (the file stream does not recurse
    into per-write directories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/out")
    (part,) = glob.glob(f"{tmp}/out/part-*.parquet")
    shutil.copy(part, path)
    shutil.rmtree(tmp)


def test_cross_batch_dup_dropped_and_gates_applied(spark, tmp_path):
    stage = str(tmp_path / "stage")
    os.makedirs(stage, exist_ok=True)
    # file 1: one good doc + one wrong-language doc
    _write(
        spark,
        f"{stage}/f1.parquet",
        [(1, GOOD_A, "en", "s", 1), (2, GOOD_B, "zz", "s", 1)],
    )
    # file 2 (later micro-batch): a NEW id carrying doc 1's exact text
    # (must drop via cross-batch state) + a genuinely new good doc
    _write(
        spark,
        f"{stage}/f2.parquet",
        [(10, GOOD_A, "en", "s", 1), (11, GOOD_B, "en", "s", 1)],
    )
    out = run_curate_stream_to_memory(
        spark,
        stage,
        table_name="curate_stream_test",
        min_quality=0.3,
        keep_langs=("en",),
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1 kept; 2 gated (lang); 10 dropped (cross-batch dup of 1); 11 kept
    assert kept == [1, 11]


def test_repetition_gate_streams(spark, tmp_path):
    stage = str(tmp_path / "rep")
    os.makedirs(stage, exist_ok=True)
    _write(
        spark,
        f"{stage}/f1.parquet",
        [(1, GOOD_A, "en", "s", 1), (2, "buy now " * 60, "en", "s", 1)],
    )
    out = run_curate_stream_to_memory(
        spark,
        stage,
        table_name="curate_stream_rep",
        min_quality=0.0,
        keep_langs=("en",),
        max_dup_trigram_frac=0.5,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]
