"""Table schemas and schema validation.

The reference enforces a single schema parameter — the vector dimension —
at construction and on every insert (``src/lib.rs:55``, ``src/lib.rs:62-72``)
and rejects ragged binary files (``src/disk_store.rs:22-27``). Here the
same contract is a declared StructType plus a ``size(embedding) == dim``
validation (see ``operators.validate``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Default dimension of the driver-generated testdata; the reference uses
# 384 (generate_mock_data.py:6) — dimension is a parameter, not a constant.
DEFAULT_DIM = 64

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
