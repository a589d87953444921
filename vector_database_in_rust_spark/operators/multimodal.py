"""Multimodal column operators (north-star extension).

Treats image/audio/video as opaque ``BINARY`` columns with typed
metadata, processed by Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batching, partitioning) is real and tested; the actual
media DECODE step is stubbed (this container ships no image/audio libs)
behind ``decode_media``: a clearly-marked deterministic fake, with the
real-library path raising ``NotImplementedError`` until PIL/librosa are
installed.

Scale notes:
- media bytes never leave the executor except through Arrow batches;
- feature extraction is embarrassingly parallel — repartition by id
  range so each task holds a bounded byte volume
  (``spark.sql.files.maxPartitionBytes`` governs the binaryFile source);
- downstream joins use only (id, features, meta), never the raw bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id BIGINT, media_type STRING, content BINARY, "
    "meta STRUCT<source: STRING, n_bytes: BIGINT>"
)

FEATURE_DIM = 16

# Set True only in environments with real decoders installed.
REAL_DECODERS_AVAILABLE = False


def attach_binary_payload(docs: DataFrame, *, media_type: str = "image") -> DataFrame:
    """Fixture adapter: lift the documents table into a media table with
    an opaque binary payload (UTF-8 bytes of the text stand in for image
    bytes — same schema/plumbing as a real ``binaryFile`` load)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def sha_feature_vector(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector derived from payload bytes:
    sha256 digest -> little-endian uint32 words (repeated to ``dim``)
    -> (word % 1000) / 1000 as float32.

    Chosen so the exact same derivation is expressible in ANSI SQL
    (sha256 hex -> byte-swapped hex substrings -> integer cast), which
    makes every stub-decode/stub-encode operator fully DuckDB-oracle-able
    — see ``harness._sha_feature_oracle``.
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(
        (digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32
    )
    return (raw % 1000).astype(np.float32) / 1000.0


def decode_media(content: bytes, media_type: str) -> np.ndarray:
    """STUB decode: returns a deterministic FEATURE_DIM-vector derived
    from the payload bytes (sha256-seeded), so the full pipeline is
    testable end-to-end without media libraries.

    Real implementation slot: PIL.Image.open for images, librosa.load
    for audio, frame sampling for video — NotImplementedError until the
    libraries exist in the runtime.
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError(
            "real decoders are not installed in this container; "
            "plug PIL/librosa decoding in here"
        )
    return sha_feature_vector(content, FEATURE_DIM)


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, media_type, n_bytes, features ARRAY<FLOAT>).

    Arrow-batched mapInPandas: one Python roundtrip per batch of rows,
    numpy inside — the correct shape for per-item media work at scale
    (never a row-at-a-time Python UDF).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_media(c, t)
                for c, t in zip(pdf["content"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(c) for c in pdf["content"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        batches,
        schema=(
            "media_id BIGINT, media_type STRING, n_bytes BIGINT, "
            "features ARRAY<FLOAT>"
        ),
    )


def feature_digests(features: DataFrame) -> DataFrame:
    """Project a ``features ARRAY<FLOAT>`` column to portable scalars:
    dimension, quantized L2 norm and md5 of the quantized values.

    Array columns do not hash portably across engines (the driver's
    row canonicalizer cannot sort them, and float formatting differs),
    so oracle-checked queries pin array outputs through this projection.
    Quantization: the stub features are k/1000 by construction, so
    ``round(x * 1000)`` recovers the exact integer k on both sides.
    """
    q = F.transform(
        F.col("features"), lambda x: F.round(x * 1000).cast("int")
    )
    sq = F.aggregate(
        q,
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + (v * v).cast("bigint"),
    )
    return features.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.size("features").cast("long").alias("feature_dim"),
        F.round(F.sqrt(sq.cast("double")) / 1000.0, 4).alias("feature_norm"),
        F.md5(F.array_join(q.cast("array<string>"), ",")).alias("feature_md5"),
    )


RESIZE_SCHEMA = (
    "media_id BIGINT, media_type STRING, out_w INT, out_h INT, content BINARY"
)


def resize_media(media: DataFrame, *, width: int = 8, height: int = 8) -> DataFrame:
    """STUB image resize: produces exactly ``width*height`` output bytes
    per item (a fake grayscale bitmap, sha256-stretched from the
    payload) so the BINARY-in/BINARY-out plumbing — Arrow batches,
    schema, per-task byte volume — is the real path. Real slot:
    ``PIL.Image.open(...).resize(...)`` when decoders are installed
    (``REAL_DECODERS_AVAILABLE``).

    The stub derivation ((sha256 digest repeated)[:w*h]) is hex-string
    arithmetic both engines can express, so the harness entry is fully
    oracle-checkable.
    """
    n_out = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("plug PIL resize in here")
            out = []
            for c in pdf["content"]:
                digest = hashlib.sha256(c).digest()
                out.append((digest * (n_out // len(digest) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "out_w": np.full(len(pdf), width, dtype=np.int32),
                    "out_h": np.full(len(pdf), height, dtype=np.int32),
                    "content": out,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


FRAME_BYTES = 64


def frame_sample(media: DataFrame, *, every_n: int = 4) -> DataFrame:
    """STUB video frame sampling: treat the payload as a stream of
    ``FRAME_BYTES``-byte frames and emit every ``every_n``-th FULL frame
    (trailing partial frames are dropped). One input row explodes into
    a variable number of output rows inside the same Arrow batch — the
    shape a real keyframe extractor (pyav/ffmpeg) produces. Scale: the
    fan-out happens executor-side; only sampled frames (bounded by
    ``len/FRAME_BYTES/every_n`` per item) leave the task.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if REAL_DECODERS_AVAILABLE:  # pragma: no cover
                raise NotImplementedError("plug pyav keyframe extraction in here")
            ids, idxs, frames = [], [], []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                n_frames = len(c) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(c[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return media.mapInPandas(
        batches, schema="media_id BIGINT, frame_idx INT, frame BINARY"
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Catalyst metadata pass over the binary column (no decode):
    per media_id byte length + payload md5. Oracle-able — byte semantics
    match DuckDB's octet_length/md5 over the same text payloads."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )
