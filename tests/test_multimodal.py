from __future__ import annotations

from vector_database_in_rust_spark.operators import multimodal as mm
from tests.conftest import SF_SMOKE


def test_extract_features_shapes(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = mm.attach_binary_payload(docs)
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in rows)
    assert all(0.0 <= v < 1.0 for r in rows[:10] for v in r["features"])


def test_extract_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    media = mm.attach_binary_payload(docs)
    a = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    assert a == b


def test_n_bytes_matches_meta(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    media = mm.attach_binary_payload(docs).cache()
    feats = mm.extract_features(media)
    joined = feats.join(media, "media_id")
    bad = joined.filter(joined.n_bytes != joined.meta.n_bytes).count()
    assert bad == 0
