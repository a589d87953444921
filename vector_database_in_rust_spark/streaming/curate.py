"""Streaming corpus curation: the batch curation gate re-expressed for
continuous ingest.

Decomposition into streaming-native pieces:
- the per-row gates (quality floor, language allowlist, Gopher
  repetition thresholds) are pure map-side expressions — they stream
  UNCHANGED, no state, evaluated inside the scan of each micro-batch;
- exact dedup — the one corpus-wide stage — becomes keyed state:
  ``dropDuplicates`` on the content md5, so the FIRST occurrence of a
  text survives and every later copy (same batch, later batch, or an
  at-least-once redelivery) drops. State is one md5 per distinct kept
  text, hash-partitioned; at 100 TB use the watermarked variant
  (``dropDuplicatesWithinWatermark``) when the duplicate horizon is
  time-bounded, same trade as streaming/dedup.py.

The fingerprint-dup stage of the batch gate (order-insensitive token
multiset) is intentionally NOT replicated here: it exists to catch
token permutations, which requires the same keyed-state shape — add a
second dropDuplicates on the fingerprint when the corpus needs it.
"""

from __future__ import annotations

from vector_database_in_rust_spark.streaming import await_or_raise

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def read_documents_stream(
    spark: SparkSession, path: str, *, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source documents stream. ``maxFilesPerTrigger=1`` forces one
    micro-batch per staged file, so cross-batch dedup state is actually
    exercised by multi-file stagings (availableNow honors it)."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def curate_stream(
    stream: DataFrame,
    *,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    max_top_token_frac: float | None = None,
    max_dup_trigram_frac: float | None = None,
) -> DataFrame:
    """Gate + dedup a documents stream; emits kept rows only (doc_id,
    text_md5, lang, quality). Same thresholds/semantics as the batch
    ``curate_corpus`` gates; dedup keeps the first-seen text."""
    from vector_database_in_rust_spark.operators.textstats import (
        dup_ngram_frac_expr,
        quality_expr,
        top_token_frac_expr,
    )

    t = F.col("text")
    cond = (quality_expr(t) >= min_quality) & F.col("lang").isin(*keep_langs)
    if max_top_token_frac is not None:
        cond = cond & (top_token_frac_expr(t) <= max_top_token_frac)
    if max_dup_trigram_frac is not None:
        cond = cond & (dup_ngram_frac_expr(t, 3) <= max_dup_trigram_frac)
    gated = stream.filter(cond).select(
        "doc_id",
        F.md5(t).alias("text_md5"),
        "lang",
        quality_expr(t).alias("quality"),
    )
    return gated.dropDuplicates(["text_md5"])


def run_curate_stream_to_memory(
    spark: SparkSession,
    staged_dir: str,
    *,
    table_name: str = "curate_stream",
    timeout_sec: int = 120,
    **gates,
):
    """Drain a finite staged directory (possibly with redelivered
    files) through the streaming curation; kept rows land in an
    in-memory table."""
    kept = curate_stream(read_documents_stream(spark, staged_dir), **gates)
    q = (
        kept.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    return spark.table(table_name)
