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
