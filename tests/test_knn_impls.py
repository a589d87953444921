"""Cross-validation of the two knn_batch implementations: the
pure-Catalyst expression form (oracle-checked) and the BLAS blocked
form must produce IDENTICAL rows — including tie-breaks at the k-th
slot, where argpartition alone would pick arbitrarily."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.knn import knn_batch
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )


def _rows(df):
    return [(r["query_id"], r["vec_id"], r["dist"]) for r in df.collect()]


@pytest.mark.parametrize("metric,digits", [("l2_squared", 4), ("cosine", 6)])
def test_expr_and_pandas_identical(spark, emb, queries, metric, digits):
    a = _rows(knn_batch(emb, queries, 10, metric=metric, round_digits=digits, impl="expr"))
    b = _rows(knn_batch(emb, queries, 10, metric=metric, round_digits=digits, impl="pandas"))
    assert a == b


def test_pandas_impl_k_larger_than_corpus(spark, emb, queries):
    small = emb.filter(F.col("vec_id") < 5)
    got = _rows(knn_batch(small, queries.limit(2), 100, impl="pandas"))
    per_q = {}
    for q, v, d in got:
        per_q.setdefault(q, []).append(v)
    assert all(len(vs) == 5 for vs in per_q.values())
