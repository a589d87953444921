"""Bucketed co-located join: the multimodal doc ⋈ embedding join with
ZERO exchanges — the 100 TB join strategy, pinned at the plan level."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.plans.explain import audit
from vector_database_in_rust_spark.sources.bucketed import (
    colocated_join,
    save_bucketed,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    save_bucketed(emb, "b_embeddings", bucket_col="vec_id", num_buckets=8)
    save_bucketed(
        docs.withColumn("join_id", F.col("doc_id")),
        "b_documents",
        bucket_col="join_id",
        num_buckets=8,
    )
    yield "b_documents", "b_embeddings"
    spark.sql("DROP TABLE IF EXISTS b_documents")
    spark.sql("DROP TABLE IF EXISTS b_embeddings")


def test_colocated_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # Disable broadcast so the plan must be a sort-merge join — the
    # bucket spec, not broadcasting, is what removes the exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark,
            left,
            right,
            on=F.col("join_id") == F.col("vec_id"),
        ).select("doc_id", "lang", "label")
        a = audit(joined)
        assert a.sort_merge_joins, a.formatted
        assert a.n_shuffle_exchanges == 0, a.formatted
        assert joined.count() == 500
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join on raw parquet needs exchanges (unless
    broadcast) — proving the bucketing is what removed them."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        joined = docs.join(emb, docs.doc_id == emb.vec_id).select("doc_id")
        assert audit(joined).n_shuffle_exchanges >= 2
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
