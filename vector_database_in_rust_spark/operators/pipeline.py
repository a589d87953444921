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


def pretrain_dedup_stages(
    docs: DataFrame,
    *,
    min_quality: float = 0.45,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    minhash_threshold: float = 0.5,
    semantic_threshold: float = 0.99,
    semantic_survival_target: float | None = None,
    embed_dim: int = 32,
    context_len: int = 2048,
    num_shards: int = 8,
    known_count: int | None = None,
    persist_boundaries: bool = True,
) -> dict[str, DataFrame]:
    """The FULL dedup-centric pretraining-corpus build, composed
    (round 12, verdict item 5): curation gate (which embeds the exact
    and fingerprint dedup passes as its first two drop reasons) ->
    MinHash near-dup clusters -> drop non-canonical cluster members ->
    stub-encoder embeddings -> SemDeDup keep/drop -> leakage-safe
    holdout split -> greedy sequence packing of the train split.

    Every stage is individually verified and 5M-measured elsewhere
    (SCALE.md rounds 9-11); this composition is the job a pretraining
    -data user actually schedules, and what it adds over the stages is
    the BOUNDARY choices: ``minhash_clusters`` and ``semantic_dedup``
    are inherently eager (KMeans fits, checkpointed pair lists), so
    the corpus cannot fuse end-to-end — the knob is whether the
    shrinking survivor corpus is persisted at each boundary
    (``persist_boundaries=True``, default: each eager stage's input
    is computed once) or re-derived from the source scan by each consumer
    (False: Catalyst re-fuses the curation filter into every
    downstream scan — cheaper storage, repeated compute). Measured at
    500k/5M by scripts/r12_pipeline.py; SCALE.md r12 records the
    winner.

    ``semantic_threshold`` is calibrated to the STUB encoder's
    geometry: sha-derived features are non-negative, so every
    embedding lives in the positive orthant and unrelated documents'
    cosines mass around 0.77 (measured p50; p99 0.95, ~1e-4 of random
    pairs reach 0.99 at dim 32) — the SemDeDup paper's 0.3-0.5
    operating range belongs to a real signed-feature encoder and would
    prune ~99% here (measured: 0.4 left 0.5% of a 43k corpus, 0.95
    left 8%). 0.99 drops only near-identical texts under the stub;
    re-tune when swapping in a real model
    (embed.REAL_ENCODER_AVAILABLE).

    ``semantic_survival_target`` (round 13) replaces the fixed
    threshold with a calibrated one: the r12 5M run showed the SAME
    0.99 eps keeping 67% at 50k but 11% at 5M (within-cluster cosine
    conditioning tightens with corpus size), so a pipeline that means
    "keep ~X%" must re-derive eps per corpus.
    :func:`~...dedup.semantic_threshold_for` measures the real greedy
    rule on THIS run's embeddings (identical clustering parameters, so
    the eps transfers exactly) and overrides ``semantic_threshold``;
    cost is one extra clustered pass x |grid| before the semantic
    stage.

    Returns an ordered dict of stage DataFrames:
    ``curated`` (kept doc rows), ``clusters`` (minhash near-dup
    clusters), ``minhash`` (post-near-dup corpus), ``semantic_keep``
    (SemDeDup decisions on minhash survivors), ``survivors``
    (post-semantic corpus), ``split`` (survivor splits), ``packed``
    (train-split packing). Keys are stable API.
    """
    from vector_database_in_rust_spark.operators.curation import holdout_split
    from vector_database_in_rust_spark.operators.dedup import (
        dedup_apply,
        minhash_clusters,
        semantic_dedup,
    )
    from vector_database_in_rust_spark.operators.embed import encode_documents
    from vector_database_in_rust_spark.operators.packing import pack_sequences

    verdicts = curate_corpus(
        docs, min_quality=min_quality, keep_langs=keep_langs
    )
    kept = verdicts.filter(F.col("kept")).select("doc_id")
    curated = docs.join(kept, "doc_id", "left_semi")
    if persist_boundaries:
        curated = curated.persist()

    clusters = minhash_clusters(
        curated,
        threshold=minhash_threshold,
        known_count=known_count,
    )
    minhash_corpus = dedup_apply(curated, clusters)
    if persist_boundaries:
        minhash_corpus = minhash_corpus.persist()

    emb = encode_documents(minhash_corpus, dim=embed_dim)
    if semantic_survival_target is not None:
        from vector_database_in_rust_spark.operators.dedup import (
            semantic_threshold_for,
        )

        semantic_threshold = semantic_threshold_for(
            emb,
            semantic_survival_target,
            id_col="doc_id",
            vec_col="embedding",
        )["threshold"]
    keep = semantic_dedup(
        emb,
        threshold=semantic_threshold,
        id_col="doc_id",
        vec_col="embedding",
    )
    survivors = minhash_corpus.join(
        keep.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    if persist_boundaries:
        survivors = survivors.persist()

    split = holdout_split(survivors)
    train = survivors.join(
        split.filter(F.col("split") == "train").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    packed = pack_sequences(
        train, context_len=context_len, num_shards=num_shards
    )
    return {
        "curated": curated,
        "clusters": clusters,
        "minhash": minhash_corpus,
        "semantic_keep": keep,
        "survivors": survivors,
        "split": split,
        "packed": packed,
    }


def pretrain_dedup_verdict(
    docs: DataFrame,
    *,
    min_quality: float = 0.45,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    known_count: int | None = None,
) -> DataFrame:
    """One-row, hash-checkable verdict over the COMPOSED pipeline —
    the stage-interaction check (a leak between stages flips a boolean
    even when every stage passes alone). SQL-expressible stage counts
    are emitted as values (the DuckDB oracle recomputes them); the
    non-SQL stages (MinHash clustering's checkpointed CC, SemDeDup's
    KMeans) are emitted as engine-verified BOOLEAN invariants that
    hold under ANY fitted clustering, pinned TRUE by the oracle — the
    registry's standing verdict pattern.

    Columns:
    - ``n_input`` / ``n_curated`` / ``n_exact_dups``: oracle-recomputed
      counts (curation gate semantics are the ``curate_corpus`` lane's,
      already hash-verified standalone).
    - ``minhash_nonincreasing``: near-dup survivors never exceed the
      curated corpus, and every survivor IS a curated doc (subset).
    - ``minhash_keeps_canonicals``: every dropped doc's cluster keeps
      its canonical (minimum-id) member in the survivor set.
    - ``semantic_subset``: SemDeDup emits exactly one decision per
      minhash survivor, and keeps are a subset.
    - ``split_partitions_survivors``: the holdout split covers every
      post-semantic survivor exactly once.
    - ``pack_tokens_conserved``: packed bins carry exactly the train
      split's documents (id-set equality) — packing loses nothing.
    """
    stages = pretrain_dedup_stages(
        docs,
        min_quality=min_quality,
        keep_langs=keep_langs,
        known_count=known_count,
        persist_boundaries=True,
    )
    curated, minhash = stages["curated"], stages["minhash"]
    keep, survivors = stages["semantic_keep"], stages["survivors"]
    split, packed = stages["split"], stages["packed"]

    n_input = docs.count()
    n_curated = curated.count()
    n_exact = (
        n_input - docs.select(F.md5("text").alias("h")).distinct().count()
    )
    n_minhash = minhash.count()
    minhash_nonincreasing = (
        n_minhash <= n_curated
        and minhash.join(curated, "doc_id", "left_anti").count() == 0
    )
    # canonical check: every near-dup cluster's canonical (minimum-id)
    # member — its cluster_id, by the star-CC labeling convention —
    # must be present in the survivor corpus
    canonicals = stages["clusters"].select(
        F.col("cluster_id").alias("doc_id")
    ).distinct()
    minhash_keeps_canonicals = (
        canonicals.join(minhash, "doc_id", "left_anti").count() == 0
    )

    n_decisions = keep.count()
    n_keep = keep.filter(F.col("keep")).count()
    semantic_subset = (
        n_decisions == n_minhash
        and survivors.join(minhash, "doc_id", "left_anti").count() == 0
        and survivors.count() == n_keep
    )
    n_surv = survivors.count()
    split_partitions_survivors = (
        split.count() == n_surv
        and split.select("doc_id").distinct().count() == n_surv
    )
    n_train = split.filter(F.col("split") == "train").count()
    pack_ids = packed.select("doc_id")
    pack_tokens_conserved = (
        pack_ids.count() == n_train
        and pack_ids.join(
            split.filter(F.col("split") == "train").select("doc_id"),
            "doc_id",
            "left_anti",
        ).count()
        == 0
    )
    # release the boundary persists — the verdict's counts are done and
    # a long-lived session (driver, bench) must not accumulate cache
    for df in (curated, minhash, survivors):
        df.unpersist()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_input,
                n_curated,
                n_exact,
                bool(minhash_nonincreasing),
                bool(minhash_keeps_canonicals),
                bool(semantic_subset),
                bool(split_partitions_survivors),
                bool(pack_tokens_conserved),
            )
        ],
        "n_input BIGINT, n_curated BIGINT, n_exact_dups BIGINT, "
        "minhash_nonincreasing BOOLEAN, minhash_keeps_canonicals BOOLEAN, "
        "semantic_subset BOOLEAN, split_partitions_survivors BOOLEAN, "
        "pack_tokens_conserved BOOLEAN",
    )
