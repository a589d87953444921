"""Embedding pipeline (O15: text -> model -> vectors).

Parity skeleton for the reference's demo pipeline
(``semantic_search.py:17-25``: ``SentenceTransformer.encode(docs)
.astype(np.float32).tofile(path)``). Model inference itself is out of
engine scope (no model runtimes in this container), so the ENCODER is a
clearly-marked deterministic stub — but the Spark-side shape is the real
production path for encoding 100 TB of text:

- ``mapInPandas`` with ONE model instantiation per partition (the
  expensive step for a real transformer — never per row, never per
  batch), Arrow-batched text in / float32 vectors out;
- the stage is embarrassingly parallel and shuffle-free: encoding cost
  scales with executors, and the output unions straight into the
  engine's canonical ``(vec_id BIGINT, embedding ARRAY<FLOAT>)`` store
  (``sources/tables.py``) or the raw-binary sink
  (``sources/binary.write_raw_f32``) for byte-level reference compat;
- the stub derivation (sha256 -> uint32 words, shared with
  ``operators.multimodal.decode_media``) is expressible in ANSI SQL, so
  unlike a real model the whole pipeline is DuckDB-oracle-checkable.

Swap ``_StubEncoder`` for a sentence-transformers model to get the
reference's exact pipeline; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vector_database_in_rust_spark.operators.multimodal import sha_feature_vector

EMBED_DIM = 32

# Set True only in environments that ship a real embedding model.
REAL_ENCODER_AVAILABLE = False


class _StubEncoder:
    """Deterministic stand-in for ``SentenceTransformer`` with the same
    batch API (``encode(list[str]) -> (n, dim) float32``,
    reference semantic_search.py:20-23)."""

    def __init__(self, dim: int):
        if REAL_ENCODER_AVAILABLE:  # pragma: no cover
            raise NotImplementedError(
                "no embedding model is installed in this container; "
                "load e.g. SentenceTransformer('all-MiniLM-L6-v2') here"
            )
        self.dim = dim

    def encode(self, texts: list[str]) -> np.ndarray:
        return np.vstack(
            [sha_feature_vector(t.encode("utf-8"), self.dim) for t in texts]
        )


def encode_documents(
    docs: DataFrame,
    *,
    dim: int = EMBED_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents -> (doc_id BIGINT, embedding ARRAY<FLOAT>).

    The distributed encoding stage of O15: model-per-partition
    ``mapInPandas`` over the text column. Output schema matches the
    engine's embedding store, so the result feeds directly into
    ``IVFIndex.build`` / ``knn_exact`` — the full reference demo
    (text -> embed -> index -> search -> doc join) composed from engine
    operators.
    """

    def run(batches):
        model = _StubEncoder(dim)  # once per partition, NOT per batch/row
        for pdf in batches:
            vecs = model.encode([str(t) for t in pdf[text_col]])
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "embedding": list(vecs)}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id BIGINT, embedding ARRAY<FLOAT>"
    )


# ---------------------------------------------------------------------------
# REAL encoder, zero dependencies (round 4): feature hashing
# (the "hashing trick", Weinberger et al. 2009) — a genuine text
# embedding whose cosine similarities carry meaning (shared tokens =>
# shared signed buckets), unlike the opaque sha stub above. Pure
# Catalyst, and SPARSE: (doc_id, bucket, weight) rows instead of dense
# arrays, so dim can be 2^20 without materializing zeros — the shape a
# 100 TB encode actually wants. The md5-derived bucket/sign arithmetic
# is shared verbatim with the DuckDB oracle.
# ---------------------------------------------------------------------------

HASH_DIM = 64


def _bucket(token):
    from pyspark.sql import functions as F

    return (
        F.conv(F.substring(F.md5(token), 1, 6), 16, 10).cast("long")
        % HASH_DIM
    )


def _sign(token):
    from pyspark.sql import functions as F

    return F.when(
        F.conv(F.substring(F.md5(token), 7, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))


def hashed_embedding_weights(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents -> SPARSE hashed embeddings: one (doc_id, bucket,
    weight) row per non-zero dimension, weight = sum of token signs in
    the bucket (zero-weight buckets dropped).

    Scale: tokenize -> explode -> one (doc, bucket)-keyed aggregation
    with map-side combine; output rows ∝ distinct non-zero buckets,
    bounded by min(tokens, HASH_DIM) per doc."""
    from pyspark.sql import functions as F

    tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    )
    return (
        tok.select("doc_id", _bucket(F.col("token")).alias("bucket"),
                   _sign(F.col("token")).alias("s"))
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def hashed_search(
    docs: DataFrame,
    query_doc_id: int,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k cosine neighbors of one document in hashed-embedding
    space, computed entirely SPARSELY: the query doc's weights
    broadcast, an equi-join on bucket pairs only co-occurring non-zero
    dimensions, and norms come from one grouped aggregate. REAL
    retrieval semantics (docs sharing vocabulary rank first; the query
    doc itself scores cosine 1.0) with no model runtime and no dense
    vector anywhere.

    Returns (doc_id, cosine) by (cosine desc, doc_id), rounded to 6."""
    from pyspark.sql import functions as F

    w = hashed_embedding_weights(docs, id_col=id_col, text_col=text_col)
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
    )
    qw = w.filter(F.col("doc_id") == query_doc_id).select(
        F.col("bucket"), F.col("weight").alias("q_weight")
    )
    qn = norms.filter(F.col("doc_id") == query_doc_id).select(
        F.col("norm").alias("q_norm")
    )
    dots = (
        w.join(F.broadcast(qw), on="bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("q_weight")).alias("dot"))
    )
    return (
        dots.join(norms, on="doc_id")
        .join(F.broadcast(qn))
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.col("norm") * F.col("q_norm")), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(k)
    )
