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
    digest = hashlib.sha256(content).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


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
