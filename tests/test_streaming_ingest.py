from __future__ import annotations

from pyspark.sql import functions as F

from vector_database_in_rust_spark.streaming.ingest import (
    ingest_vectors,
    read_vector_stream,
)
from tests.conftest import SF_SMOKE


def test_streaming_append_with_quarantine(spark, tmp_path):
    src = tmp_path / "incoming"
    store = tmp_path / "store"
    quarantine = tmp_path / "bad"
    src.mkdir()

    good = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(100)
    bad = spark.createDataFrame(
        [(90001, [1.0, 2.0], 0)], "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    # seed the store, then stream two files: one valid, one ragged
    good.limit(10).write.parquet(str(store))
    good.filter(F.col("vec_id") >= 10).write.parquet(str(src / "batch1"))
    bad.write.parquet(str(src / "batch2"))

    ingest_vectors(
        read_vector_stream(spark, str(src) + "/*"),
        str(store),
        dimensions=64,
        quarantine_path=str(quarantine),
        checkpoint_path=str(tmp_path / "ckpt"),
    )

    final = spark.read.parquet(str(store))
    assert final.count() == 100  # 10 seeded + 90 streamed valid
    assert final.filter(F.size("embedding") != 64).count() == 0
    q = spark.read.parquet(str(quarantine))
    assert q.count() == 1
    assert q.first()["vec_id"] == 90001
