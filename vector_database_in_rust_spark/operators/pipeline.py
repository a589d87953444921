"""End-to-end corpus pipeline composition: curate -> chunk -> shard.

Each stage exists (and is verified) on its own — ``curation.
curate_corpus``, ``packing.chunk_documents``, the md5-prefix shard
discipline of ``packing.shard_expr`` — but a training-data pipeline
runs them COMPOSED, and composition is where integration bugs live
(a verdict column leaking into the chunker, a shard key computed on
the doc instead of the chunk). This module wires the full chain as one
lazy plan and returns the per-shard manifest a shard writer would
consume; the whole chain stays a single Catalyst DAG (no
materialization between stages), so Spark fuses the curation filter
into the chunk explode's scan.

Scale shape: curation shuffles on content hashes (corpus-sized keys,
no pairs), chunking is a zero-shuffle flatMap, the manifest is one
map-side-combinable groupBy on the shard id. Text bodies cross exactly
one shuffle boundary (none — the chunk explode is narrow and the
manifest projects counts before aggregating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.curation import curate_corpus
from vector_database_in_rust_spark.operators.packing import chunk_documents


def curate_chunk_shard(
    docs: DataFrame,
    *,
    min_quality: float = 0.45,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    chunk_size: int = 32,
    stride: int = 24,
    num_shards: int = 8,
) -> DataFrame:
    """Curate -> chunk survivors -> hash-shard CHUNKS -> manifest.

    The shard key is the md5 prefix of ``doc_id _ chunk_id`` — chunks
    of one document spread across shards (what sequence-level training
    wants: no document-locality bias within a shard), yet every
    assignment is a pure function of stable ids (retry-deterministic,
    reproducible across runs). Returns one row per shard:
    (shard, n_chunks, n_docs, total_tokens).
    """
    verdicts = curate_corpus(
        docs, min_quality=min_quality, keep_langs=keep_langs
    )
    kept = verdicts.filter(F.col("kept")).select("doc_id")
    chunks = chunk_documents(
        docs.join(kept, on="doc_id"), chunk_size=chunk_size, stride=stride
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("doc_id"), F.col("chunk_id"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        % num_shards
    ).cast("int")
    return (
        chunks.select(
            shard.alias("shard"),
            "doc_id",
            "n_tokens",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def pretrain_corpus(
    docs: DataFrame,
    *,
    min_quality: float = 0.45,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    chunk_size: int = 32,
    stride: int = 24,
    num_shards: int = 8,
) -> DataFrame:
    """The full pretraining-corpus build as ONE lazy DAG: curation gate
    -> deterministic train-split (the val/test 10% held out BEFORE
    chunking, so no document leaks fragments across the boundary) ->
    overlapping-window chunking of the survivors -> chunk-level hash
    sharding -> per-shard manifest. Every stage is a pure function of
    stable ids; the composition fuses — Catalyst pushes the curation
    and split predicates into the chunker's single scan of documents.

    This is the job a user actually schedules nightly; the component
    stages are verified individually elsewhere, and the composed
    manifest is hash-checked end-to-end so an interaction bug BETWEEN
    stages (a verdict leak, split-before-dedup ordering, chunk window
    drift) flips the hash even when every stage passes alone.
    """
    from vector_database_in_rust_spark.operators.curation import (
        curate_corpus,
        holdout_split,
    )

    verdicts = curate_corpus(
        docs, min_quality=min_quality, keep_langs=keep_langs
    )
    kept = verdicts.filter(F.col("kept")).select("doc_id")
    train = holdout_split(docs).filter(F.col("split") == "train").select("doc_id")
    base = docs.join(kept, "doc_id", "left_semi").join(
        train, "doc_id", "left_semi"
    )
    chunks = chunk_documents(base, chunk_size=chunk_size, stride=stride)
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.col("doc_id"), F.col("chunk_id"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        % num_shards
    ).cast("int")
    return (
        chunks.select(shard.alias("shard"), "doc_id", "n_tokens")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
