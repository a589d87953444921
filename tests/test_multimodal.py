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


def test_resize_output_contract(spark):
    import hashlib

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    media = mm.attach_binary_payload(docs)
    out = {r["media_id"]: r for r in mm.resize_media(media, width=4, height=6).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(out) == set(texts)
    for mid, r in out.items():
        assert (r["out_w"], r["out_h"]) == (4, 6)
        assert len(r["content"]) == 24
        digest = hashlib.sha256(texts[mid].encode()).digest()
        assert bytes(r["content"]) == (digest * 1)[:24]


def test_frame_sample_exact_frames(spark):
    """Every emitted frame must be the exact byte slice of the payload
    at its index; indices step by every_n over FULL frames only."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    media = mm.attach_binary_payload(docs)
    frames = mm.frame_sample(media, every_n=3).collect()
    texts = {r["doc_id"]: r["text"].encode() for r in docs.collect()}
    seen = {}
    for r in frames:
        payload = texts[r["media_id"]]
        i = r["frame_idx"]
        assert i % 3 == 0
        want = payload[i * mm.FRAME_BYTES : (i + 1) * mm.FRAME_BYTES]
        assert bytes(r["frame"]) == want and len(want) == mm.FRAME_BYTES
        seen.setdefault(r["media_id"], set()).add(i)
    for mid, payload in texts.items():
        n_frames = len(payload) // mm.FRAME_BYTES
        want_idx = set(range(0, n_frames, 3))
        assert seen.get(mid, set()) == want_idx
