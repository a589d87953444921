"""Hybrid retrieval quality bars: BM25 ranking semantics (tf
saturation, idf discrimination) and RRF fusion arithmetic, plus the
no-Python-in-plan guard for the lexical path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_database_in_rust_spark.operators.search import (
    bm25_scores,
    hybrid_search_rrf,
)


def test_bm25_prefers_term_rich_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "hash hash hash join filler words here"),
            (2, "hash only once in this document text"),
            (3, "nothing relevant in here at all folks"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = bm25_scores(docs, ["hash", "join"], top_n=10).collect()
    ids = [r["doc_id"] for r in out]
    assert ids[0] == 1, "doc with 3x tf + extra matched term must rank first"
    assert 3 not in ids, "doc with zero query terms must not appear"


def test_bm25_idf_discriminates_rare_terms(spark):
    """Equal tf: a RARE term must outscore a term present in every
    document (the idf component)."""
    rows = [(i, "common filler text pad pad pad pad") for i in range(10)]
    rows.append((100, "rare filler text pad pad pad pad"))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    # every doc also contains 'common'
    docs = docs.withColumn("text", F.concat(F.col("text"), F.lit(" common")))
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, ["rare", "common"], top_n=20).collect()
    }
    assert out[100] > max(v for k, v in out.items() if k != 100)


def test_rrf_matches_hand_fusion(spark):
    """The fused scores must equal 1/(60+lex_rank) + 1/(60+sem_rank)
    computed by hand from the two independent rank lists."""
    from vector_database_in_rust_spark.operators.knn import knn_exact

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.filter("vec_id = 0").first()["embedding"]
    terms = ["hash", "merge", "spark"]

    lex = bm25_scores(docs, terms, top_n=20).collect()
    lex_rank = {r["doc_id"]: i + 1 for i, r in enumerate(lex)}
    sem = knn_exact(emb, [float(x) for x in q], 20).collect()
    sem_rank = {r["vec_id"]: i + 1 for i, r in enumerate(sem)}

    want = {}
    for d in set(lex_rank) | set(sem_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (60 + lex_rank[d])
        if d in sem_rank:
            s += 1.0 / (60 + sem_rank[d])
        want[d] = round(s, 6)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["doc_id"], r["rrf"])
        for r in hybrid_search_rrf(docs, emb, terms, [float(x) for x in q]).collect()
    ]
    assert got == top


def test_bm25_plan_stays_jvm_side(spark):
    """The lexical path must contain no Python evaluation (everything
    in codegen) and only explode query-term HITS, never all tokens."""
    from vector_database_in_rust_spark.plans.explain import formatted_plan

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    plan = formatted_plan(bm25_scores(docs, ["hash", "merge"], top_n=10))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # the explode exists...
    assert "filter(" in plan.lower()  # ...but over the filtered hits array
