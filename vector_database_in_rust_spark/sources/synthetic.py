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


def generate_documents(
    spark: SparkSession,
    n: int,
    *,
    avg_words: int = 120,
    vocab_size: int = 10_000,
    dup_fraction: float = 0.02,
    zipf_a: float = 1.3,
    seed: int = 42,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    sources: tuple[str, ...] = ("web", "wiki", "books", "code"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic document corpus with the driver testdata's schema
    (doc_id, text, lang, source, n_chars) — the text-side analogue of
    :func:`generate_vectors` (reference O16 generalized to the text
    pipeline surface). Used by ``scripts/scaling_study.py`` to measure
    operator scaling beyond the fixed sf0.1 testdata.

    Properties, all deterministic per (seed, doc_id) and independent
    of partitioning:

    - word counts ~ Poisson(avg_words) (floor 20), tokens drawn
      Zipf(``zipf_a``) over a ``vocab_size`` vocabulary — a realistic
      head-heavy token distribution for shingle/minhash work;
    - a ``dup_fraction`` share of documents are ~95%-overlap
      perturbed near-copies of an earlier document (the planted
      near-dup structure dedup operators must find); the copy
      re-derives its source's tokens from (seed, source_id), so no
      cross-row state is needed;
    - lang/source assigned round-robin (stable mix for stratified
      ops).
    """

    def _words(rng, k: int) -> np.ndarray:
        return rng.zipf(zipf_a, size=k) % vocab_size

    def _final_tokens(i: int) -> np.ndarray:
        """EMITTED token stream of doc i — follows the dup chain, so a
        planted copy overlaps its source's actual text even when the
        source itself took the dup branch (re-deriving only the
        source's pre-dup stream would plant ~dup_fraction of the pairs
        against text that never exists in the corpus). The chain is
        strictly decreasing in doc_id and terminates below 50; still a
        pure function of (seed, i), so determinism and
        partition-independence hold."""
        rng = np.random.default_rng((seed, i))
        nw = max(20, int(rng.poisson(avg_words)))
        vids = _words(rng, nw)
        if i >= 50 and rng.random() < dup_fraction:
            src_id = i - 1 - int(rng.integers(0, 40))
            vids = _final_tokens(src_id).copy()
            for j in range(0, len(vids), 20):  # ~5% perturbation
                vids[j] = int(rng.integers(0, vocab_size))
        return vids

    def gen(batches):
        for pdf in batches:
            ids, texts, lg, src_col, nch = [], [], [], [], []
            for i in pdf["id"]:
                i = int(i)
                vids = _final_tokens(i)
                text = " ".join(f"w{v}" for v in vids)
                ids.append(i)
                texts.append(text)
                lg.append(langs[i % len(langs)])
                src_col.append(sources[i % len(sources)])
                nch.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": texts,
                    "lang": lg,
                    "source": src_col,
                    "n_chars": nch,
                }
            )

    rng = spark.range(n, numPartitions=num_partitions)
    return rng.mapInPandas(
        gen,
        schema="doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
