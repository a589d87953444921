"""Driver-harness query registry: Spark queries + DuckDB oracle SQL.

Every exact operator from SURVEY.md §2 registers a pair here:
- ``QUERIES[name]``: a callable ``(spark, sf_dir) -> DataFrame``
- ``ORACLES[name]``: equivalent ANSI SQL that DuckDB runs on the same
  parquet tables (views: region nation customer supplier part orders
  lineitem events documents embeddings)

Determinism contract (FIXTURES.md §C):
- every float output column is ``round(x, 4)`` (distances) or
  ``round(x, 6)`` (ratios/similarities) in BOTH dialects, computed in
  DOUBLE, so partition-order float non-associativity cannot flip a hash;
- every top-k tie-breaks on ``(dist, vec_id)`` — stricter than the
  reference's distance-only sort (src/lib.rs:95);
- aggregate/computed columns carry identical aliases in both dialects
  (the driver hashes columns sorted by name).

Approximate operators (IVF/LSH ANN, MinHash, SimHash) register a query
but NO oracle — the driver records a rows-only check, and pytest holds
the real bar (recall@k vs the exact oracle, pair-recovery vs exact
Jaccard).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_in_rust_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_squared,
)
from vector_database_in_rust_spark.operators import knn as knn_ops
from vector_database_in_rust_spark.operators import validate as validate_ops
from vector_database_in_rust_spark.schemas import DEFAULT_DIM
from vector_database_in_rust_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _query_vec_df(spark, sf_dir, n: int = 1):
    """The first n stored vectors as a query set (vec_id < n).

    Using stored vectors as queries keeps the harness self-contained and
    makes the reference's self-query invariant (querying a stored vector
    returns itself at distance ~0, src/lib.rs:543-549) part of every run.
    """
    return (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_embedding"),
        )
    )


# SQL fragment: squared L2 between two DuckDB FLOAT[] lists, in DOUBLE.
# inner-product identity: |a-b|^2 = <a,a> - 2<a,b> + <b,b>; DuckDB's
# list_inner_product is the only list kernel guaranteed not to rescale.
def _sql_l2sq(a: str, b: str) -> str:
    return (
        f"(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])"
        f" - 2 * list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"
        f" + list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))"
    )


def _sql_cosine(a: str, b: str) -> str:
    # zero-norm -> 0.0 guard matches src/lib.rs:43-45.
    na = f"sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    nb = f"sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[]))"
    dot = f"list_inner_product({a}::DOUBLE[], {b}::DOUBLE[])"
    return f"(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE {dot} / ({na} * {nb}) END)"


# ---------------------------------------------------------------------------
# O1/O3: source scan + count (disk_store.rs:14-36, lib.rs:9)
# ---------------------------------------------------------------------------

@register(
    "scan_embeddings",
    "SELECT vec_id, label, len(embedding) AS dim FROM embeddings",
)
def scan_embeddings(spark, sf_dir):
    """Full store scan (O1). Projects scalars + dimension, not the raw
    floats, so the hash check is byte-stable across float codecs."""
    return _emb(spark, sf_dir).select(
        "vec_id", "label", F.size("embedding").alias("dim")
    )


@register("count_vectors", "SELECT count(*) AS n_vectors FROM embeddings")
def count_vectors(spark, sf_dir):
    """Store length (O3, lib.rs:17-19, VectorDB.len lib.rs:350-352)."""
    return _emb(spark, sf_dir).agg(F.count(F.lit(1)).alias("n_vectors"))


@register(
    "fetch_by_id",
    "SELECT vec_id, label, len(embedding) AS dim, "
    "round(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]), 4) "
    "AS sq_norm FROM embeddings WHERE vec_id = 42",
)
def fetch_by_id(spark, sf_dir):
    """Positional row fetch (O2, disk_store.rs:40-47) as a pushed-down
    point predicate on the Parquet scan."""
    df = _emb(spark, sf_dir).filter(F.col("vec_id") == 42)
    return df.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(dot_product(F.col("embedding"), F.col("embedding")), 4).alias(
            "sq_norm"
        ),
    )


@register(
    "validate_dims",
    f"SELECT count(*) AS n_rows, "
    f"cast(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = {DEFAULT_DIM} "
    f"THEN 1 ELSE 0 END) AS BIGINT) AS n_valid, "
    f"cast(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = {DEFAULT_DIM} "
    f"THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid FROM embeddings",
)
def validate_dims(spark, sf_dir):
    """Dimension contract check (O4, lib.rs:62-72 / disk_store.rs:22-27)."""
    return validate_ops.validate_dims(_emb(spark, sf_dir), DEFAULT_DIM)


# ---------------------------------------------------------------------------
# O5/O6: distance scalar functions over the whole store
# ---------------------------------------------------------------------------

_L2_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({_sql_l2sq('e.embedding', 'q.qe')}, 4) AS dist
FROM embeddings e CROSS JOIN q
"""


@register("l2_distance", _L2_ORACLE)
def l2_distance(spark, sf_dir):
    """Squared-L2 of every stored vector to vector 0 (O5, lib.rs:28-30).
    Pure Catalyst zip_with/aggregate — no UDF, whole-stage codegen."""
    emb = _emb(spark, sf_dir)
    q = _query_vec_df(spark, sf_dir, 1).select(
        F.col("query_embedding").alias("qe")
    )
    return emb.join(F.broadcast(q), how="cross").select(
        "vec_id",
        F.round(l2_squared(F.col("embedding"), F.col("qe")), 4).alias("dist"),
    )


_COS_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({_sql_cosine('e.embedding', 'q.qe')}, 6) AS cos_sim
FROM embeddings e CROSS JOIN q
"""


@register("cosine_similarity", _COS_ORACLE)
def cosine_similarity_q(spark, sf_dir):
    """Cosine of every stored vector to vector 0 (O6, lib.rs:32-47,
    zero-norm guard lib.rs:43-45). NB: dead code in the reference (no call
    sites) — implemented for public-surface parity."""
    emb = _emb(spark, sf_dir)
    q = _query_vec_df(spark, sf_dir, 1).select(
        F.col("query_embedding").alias("qe")
    )
    return emb.join(F.broadcast(q), how="cross").select(
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), F.col("qe")), 6).alias(
            "cos_sim"
        ),
    )


# ---------------------------------------------------------------------------
# O7: exact k-NN — the flagship (lib.rs:74-97)
# ---------------------------------------------------------------------------

KNN_K = 5

_KNN_EXACT_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, round({_sql_l2sq('e.embedding', 'q.qe')}, 4) AS dist
FROM embeddings e CROSS JOIN q
ORDER BY dist, vec_id LIMIT {KNN_K}
"""


@register("knn_exact", _KNN_EXACT_ORACLE)
def knn_exact(spark, sf_dir):
    """Exact top-k to the stored vector 0 (O7). The self-query invariant
    (lib.rs:543-549) means row 1 must be vec_id 0 at dist 0.0."""
    emb = _emb(spark, sf_dir)
    q = _query_vec_df(spark, sf_dir, 1).select(
        F.col("query_embedding").alias("qe")
    )
    scored = emb.join(F.broadcast(q), how="cross")
    return knn_ops.knn_exact(scored, F.col("qe"), KNN_K)


_KNN_BATCH_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id,
         round({_sql_l2sq('e.embedding', 'q.qe')}, 4) AS dist
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS r
  FROM scored
)
SELECT query_id, vec_id, dist FROM ranked WHERE r <= {KNN_K}
"""


@register("knn_batch", _KNN_BATCH_ORACLE)
def knn_batch(spark, sf_dir):
    """Batched exact k-NN: 8 queries (the reference answers one query per
    FFI call, benchmark.py:23-29; this is its bulk generalization)."""
    return knn_ops.knn_batch(
        _emb(spark, sf_dir), _query_vec_df(spark, sf_dir, 8), KNN_K
    )


_KNN_JOIN_ORACLE = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
topk AS (
  SELECT e.vec_id, round({_sql_l2sq('e.embedding', 'q.qe')}, 4) AS dist
  FROM embeddings e CROSS JOIN q
  ORDER BY dist, vec_id LIMIT {KNN_K}
)
SELECT t.vec_id, t.dist, d.lang, d.source, d.n_chars
FROM topk t JOIN documents d ON t.vec_id = d.doc_id
"""


@register("knn_join_documents", _KNN_JOIN_ORACLE)
def knn_join_documents(spark, sf_dir):
    """O14: join k-NN results back to documents (semantic_search.py:43-46)
    as a broadcast hash join — the k-row result side broadcasts."""
    topk = knn_exact(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    joined = docs.join(
        F.broadcast(topk), on=topk.vec_id == docs.doc_id, how="inner"
    )
    return joined.select("vec_id", "dist", "lang", "source", "n_chars")
