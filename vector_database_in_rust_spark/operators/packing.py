"""Training-data output shaping: shard assignment and sequence packing.

The last mile of a pretraining pipeline: curated documents must land in
N balanced output shards, and each shard's documents must be packed
into fixed-length context windows. (No analogue in the reference — its
output is a raw vector file, semantic_search.py:25.)

- ``shard_assignments`` / ``shard_manifest``: deterministic hash
  sharding (md5-prefix of the stable doc id, same discipline as
  ``curation.stratified_sample``) — reproducible across runs/retries,
  and statistically balanced regardless of id clustering, unlike
  ``doc_id % n``. Pure Catalyst scan + groupBy.
- ``pack_sequences``: greedy first-fit packing of each shard's docs
  (in doc_id order) into bins of ``context_len`` tokens. Inherently
  sequential WITHIN a shard (each bin decision depends on the running
  fill), so it runs as one Arrow-batched ``applyInPandas`` per shard —
  shards pack independently, so parallelism == num_shards and per-task
  memory is one shard's (doc_id, n_tokens) pairs, NOT its text: token
  counts are computed Spark-side and only the tiny id/count columns
  cross into Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.text import tokens

PACKED_SCHEMA = (
    "shard INT, bin_id BIGINT, doc_id BIGINT, n_tokens BIGINT, overflow BOOLEAN"
)


def shard_expr(id_col: str, num_shards: int):
    """Shard in [0, num_shards): md5-prefix of the id, mod n. The hex
    arithmetic is expressible in ANSI SQL (DuckDB: ('0x'||substr)::BIGINT),
    so assignments are oracle-checkable."""
    hex6 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 6)
    return (F.conv(hex6, 16, 10).cast("bigint") % num_shards).cast("int")


def shard_assignments(
    docs: DataFrame,
    *,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tokens): the routing table for shard writers."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        shard_expr(id_col, num_shards).alias("shard"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )


def shard_manifest(
    docs: DataFrame,
    *,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest (doc/token totals) — the balance check a shard
    writer emits. One map-side-combinable groupBy on the shard id."""
    return (
        shard_assignments(
            docs, num_shards=num_shards, id_col=id_col, text_col=text_col
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    *,
    context_len: int = 2048,
    num_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy first-fit packing of each shard's documents into context
    windows: scan docs in ``doc_id`` order, open a new bin whenever the
    next doc would overflow ``context_len``. A single doc longer than
    the context gets its own bin with ``overflow = true`` (the caller
    decides truncate-vs-split). Bin ids are globally unique
    (``shard * 2^40 + ordinal``) and the assignment is a pure function
    of (shard membership, doc_id order) — deterministic under retries.

    Scale: only (doc_id, shard, n_tokens) rows enter the shard shuffle
    — text never moves — and each applyInPandas group holds ONE
    shard's routing rows (~16 bytes/doc). ``num_shards`` is therefore
    the per-task state and parallelism knob: size it so
    corpus_rows / num_shards stays in the low millions (10^10 docs →
    10^4 shards ≈ 16 MB/task), not the default 8, which is sized for
    test corpora. Greedy first-fit within a shard is inherently
    sequential by the doc_id-order contract; shards are the parallel
    unit.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
        base = shard << 40
        ordinal, fill = 0, 0
        bins, overflows = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > context_len:
                ordinal += 1
                fill = 0
            overflow = n > context_len
            bins.append(base + ordinal)
            overflows.append(overflow)
            fill += n
            if overflow:  # oversized doc seals its own bin
                ordinal += 1
                fill = 0
        return pd.DataFrame(
            {
                "shard": pdf["shard"].astype("int32"),
                "bin_id": pd.Series(bins, dtype="int64", index=pdf.index),
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "overflow": pd.Series(overflows, dtype="bool", index=pdf.index),
            }
        )

    assigned = shard_assignments(
        docs, num_shards=num_shards, id_col=id_col, text_col=text_col
    )
    return assigned.groupBy("shard").applyInPandas(pack, schema=PACKED_SCHEMA)


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the step between raw
    documents and sequence packing: long documents become
    ``chunk_size``-token windows advancing by ``stride`` tokens
    (``chunk_size - stride`` tokens of overlap preserve context across
    boundaries, the standard pretraining-corpus shape).

    Pure Catalyst: window starts come from ``sequence(0, n-1, stride)``
    (so every start is < n and the tail chunk keeps its remaining
    tokens), one ``explode`` per chunk — the output relation is
    |chunks|, roughly |tokens| / stride rows, and the heavy ``slice`` +
    ``concat_ws`` run inside codegen. No shuffle at all: chunking is a
    per-row flatMap, and downstream sharding/packing owns any
    repartitioning."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            toks.alias("_toks"),
            F.explode(starts).alias("_start"),
        )
        .select(
            "doc_id",
            (F.col("_start") / stride).cast("int").alias("chunk_id"),
            F.slice(F.col("_toks"), F.col("_start") + 1, chunk_size).alias("_c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("_c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.col("_c")).alias("chunk_text"),
        )
    )


def bin_manifest(packed: DataFrame, *, context_len: int = 2048) -> DataFrame:
    """Per-shard bin fill statistics over ``pack_sequences`` output —
    what a training job reads to judge packing efficiency before
    touching any shard: bins per shard, mean/max fill ratio (overflow
    bins exceed 1.0 by construction), overflow count, token total.
    Two map-side-combinable groupBys ((shard, bin_id) then shard) over
    the tiny (ids, counts) relation — text never appears."""
    per_bin = packed.groupBy("shard", "bin_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("overflow").cast("int")).alias("has_overflow"),
    )
    ratio = F.col("fill") / F.lit(float(context_len))
    return per_bin.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(F.avg(ratio), 6).alias("avg_fill"),
        F.round(F.max(ratio), 6).alias("max_fill"),
        F.sum("has_overflow").cast("long").alias("n_overflow_bins"),
        F.sum("fill").alias("total_tokens"),
    )
