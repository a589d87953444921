"""Synthetic vector generation (reference O16, generate_mock_data.py).

The reference writes 100,000 x 384-d standard-normal float32 vectors to
a raw binary file with numpy (generate_mock_data.py:13-18). The engine
equivalent is fully distributed and deterministic: ``spark.range(n)``
gives the dense positional IDs (the reference's id-is-offset semantics),
and each row's floats derive from seeded ``randn`` keyed by (seed, id) —
reproducible regardless of partitioning, unlike ``F.rand`` whose values
depend on partition layout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    *,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """n x dim standard-normal vectors as (vec_id BIGINT, embedding
    ARRAY<FLOAT>), deterministic per (seed, vec_id).

    Scale: generation is embarrassingly parallel over ``spark.range``
    partitions; each task seeds numpy per row-id, so output is identical
    for any partitioning/executor count.
    """

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mats = [
                np.random.default_rng((seed, int(i))).standard_normal(dim).astype(np.float32)
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": mats})

    rng = spark.range(n, numPartitions=num_partitions)
    return rng.mapInPandas(gen, schema="vec_id BIGINT, embedding ARRAY<FLOAT>")


def generate_reference_format(
    spark: SparkSession, path: str, n: int = 100_000, dim: int = 384, seed: int = 42
) -> None:
    """Write the reference's exact on-disk artifact shape (row-major
    float32 raw binary, generate_mock_data.py:18) from the distributed
    generator — the bridge for byte-level interop tests."""
    from vector_database_in_rust_spark.sources.binary import write_raw_f32

    write_raw_f32(generate_vectors(spark, n, dim, seed=seed), path)
