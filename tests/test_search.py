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


def test_mmr_skips_near_duplicate(spark):
    """With a duplicated embedding in the pool, plain top-2 takes both
    copies; MMR must take the top hit then the orthogonal doc."""
    from vector_database_in_rust_spark.operators.search import mmr_rerank

    rows = [
        (7, 1, 0.99, [1.0, 0.0]),
        (7, 2, 0.98, [1.0, 0.0]),   # duplicate direction of vec 1
        (7, 3, 0.50, [0.0, 1.0]),   # orthogonal
    ]
    cand = spark.createDataFrame(
        rows, "query_id BIGINT, vec_id BIGINT, rel DOUBLE, embedding ARRAY<DOUBLE>"
    )
    got = [r["vec_id"] for r in mmr_rerank(cand, k=2, lambda_=0.5).collect()]
    assert got == [1, 3]


def test_mmr_lambda_one_is_plain_topk(spark):
    """lambda=1 disables the diversity term -> selection order must be
    pure relevance (with the id tie-break)."""
    from vector_database_in_rust_spark.operators.search import mmr_rerank

    rows = [
        (1, 10, 0.9, [1.0, 0.0]),
        (1, 11, 0.9, [1.0, 0.0]),
        (1, 12, 0.8, [0.5, 0.5]),
    ]
    cand = spark.createDataFrame(
        rows, "query_id BIGINT, vec_id BIGINT, rel DOUBLE, embedding ARRAY<DOUBLE>"
    )
    got = [r["vec_id"] for r in mmr_rerank(cand, k=3, lambda_=1.0).collect()]
    assert got == [10, 11, 12]


def test_mmr_matches_numpy_reference(spark):
    """The distributed applyInPandas result must equal an independent
    driver-side NumPy greedy on the same candidate lists (sf0.001,
    8 queries) — rank for rank, score for score."""
    import numpy as np

    from vector_database_in_rust_spark import harness
    from vector_database_in_rust_spark.operators.search import mmr_rerank

    lam, k = 0.7, 5
    cand = harness.mmr_candidates(spark, SF_SMOKE)
    got = [
        (r["query_id"], r["rank"], r["vec_id"], r["mmr_score"])
        for r in mmr_rerank(cand, k=k, lambda_=lam).collect()
    ]
    want = []
    pdf = cand.toPandas()
    for qid, grp in pdf.groupby("query_id"):
        ids = grp["vec_id"].to_numpy()
        rel = grp["rel"].to_numpy(dtype="float64")
        emb = np.stack(grp["embedding"].to_numpy()).astype("float64")
        unit = emb / np.linalg.norm(emb, axis=1)[:, None]
        picked, max_sim = [], np.zeros(len(ids))
        for rank in range(1, k + 1):
            mmr = lam * rel - (1 - lam) * max_sim
            for i in picked:
                mmr[i] = -np.inf
            best = mmr.max()
            tied = np.flatnonzero(mmr == best)
            tied = tied[np.lexsort((ids[tied], -rel[tied]))]
            i = int(tied[0])
            picked.append(i)
            want.append((qid, rank, int(ids[i]), round(float(best), 6)))
            max_sim = np.maximum(max_sim, unit @ unit[i])
    assert sorted(got) == sorted(want)


class TestHashedEmbeddings:
    def test_self_retrieval_at_cosine_one(self, spark):
        from vector_database_in_rust_spark.operators.embed import hashed_search
        from tests.conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        top = hashed_search(docs, query_doc_id=3, k=5).collect()
        assert top[0]["doc_id"] == 3
        assert top[0]["cosine"] == 1.0
        cosines = [r["cosine"] for r in top]
        assert cosines == sorted(cosines, reverse=True)

    def test_shared_vocabulary_ranks_above_disjoint(self, spark):
        """A real encoder must rank a vocabulary-sharing doc above a
        vocabulary-disjoint one — the semantic property the sha stub
        lacks."""
        from vector_database_in_rust_spark.operators.embed import hashed_search

        rows = [
            (0, "alpha beta gamma delta"),
            (1, "alpha beta gamma epsilon"),  # 3/4 tokens shared with 0
            (2, "zeta eta theta iota"),  # disjoint
        ]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        got = {r["doc_id"]: r["cosine"] for r in hashed_search(docs, 0, 3).collect()}
        assert got[0] == 1.0
        assert got[1] > got.get(2, -1.0)

    def test_sparse_weights_match_dense_reference(self, spark):
        """Sparse (doc, bucket, weight) rows must equal a python
        reference computing the same md5 bucket/sign arithmetic."""
        import hashlib

        from vector_database_in_rust_spark.operators.embed import (
            HASH_DIM,
            hashed_embedding_weights,
        )

        rows = [(0, "a b c a"), (1, "x y"), (2, "")]
        docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        got = {
            (r["doc_id"], r["bucket"]): r["weight"]
            for r in hashed_embedding_weights(docs).collect()
        }
        want = {}
        for did, text in rows:
            for tok in text.split(" "):
                h = hashlib.md5(tok.encode()).hexdigest()
                b = int(h[:6], 16) % HASH_DIM
                s = 1 if int(h[6], 16) % 2 == 0 else -1
                want[(did, b)] = want.get((did, b), 0) + s
        want = {k: v for k, v in want.items() if v != 0}
        assert got == want


def test_maxsim_self_retrieval_and_partial_overlap(spark):
    """MaxSim invariants: the query doc ranks first with score exactly
    its distinct-token count; a doc sharing half the query's tokens
    scores at least that many points (each shared token contributes its
    perfect self-match 1.0) — the soft-overlap behavior single-vector
    cosine can't express."""
    from vector_database_in_rust_spark.operators.search import maxsim_search

    docs = spark.createDataFrame(
        [
            (7, "alpha beta gamma delta"),
            (1, "alpha beta zzz www"),          # shares 2 of 4
            (2, "qqq rrr sss ttt"),              # shares 0
            (3, "alpha beta gamma delta"),       # exact dup of the query
        ],
        "doc_id long, text string",
    )
    got = maxsim_search(docs, 7, 10).collect()
    scores = {r["doc_id"]: r["maxsim"] for r in got}
    assert scores[7] == 4.0 and scores[3] == 4.0
    assert got[0]["doc_id"] in (3, 7)
    assert scores[1] >= 2.0
    assert scores[1] > scores[2]


def test_maxsim_is_order_and_multiplicity_invariant(spark):
    """Token order and repetition must not change MaxSim over distinct
    token sets (per-doc distinct is part of the contract)."""
    from vector_database_in_rust_spark.operators.search import maxsim_search

    a = spark.createDataFrame(
        [(7, "alpha beta gamma"), (1, "beta gamma alpha")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(7, "alpha beta gamma"), (1, "alpha alpha beta beta gamma")],
        "doc_id long, text string",
    )
    sa = {r["doc_id"]: r["maxsim"] for r in maxsim_search(a, 7, 10).collect()}
    sb = {r["doc_id"]: r["maxsim"] for r in maxsim_search(b, 7, 10).collect()}
    assert sa[1] == sa[7] == sb[1] == 3.0


def test_rank_metrics_known_values(spark):
    """Hand-computable case: truth {1,2,3}; system ranks [5,1,9,2]."""
    import math

    from vector_database_in_rust_spark.operators.search import rank_metrics

    truth = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)], "query_id long, vec_id long, rank long"
    )
    system = spark.createDataFrame(
        [(0, 5, 1), (0, 1, 2), (0, 9, 3), (0, 2, 4)],
        "query_id long, vec_id long, rank long",
    )
    r = rank_metrics(system, truth, k=10).collect()[0]
    assert r["recall_at_k"] == round(2 / 3, 6)
    assert r["mrr"] == 0.5                      # first hit at rank 2
    dcg = 1 / math.log2(3) + 1 / math.log2(5)   # hits at ranks 2 and 4
    idcg = sum(1 / math.log2(p + 1) for p in (1, 2, 3))
    assert r["ndcg_at_k"] == round(dcg / idcg, 6)


def test_rank_metrics_perfect_system_scores_one(spark):
    from vector_database_in_rust_spark.operators.search import rank_metrics

    rows = [(0, v, r) for r, v in enumerate([7, 3, 9], start=1)]
    df = spark.createDataFrame(rows, "query_id long, vec_id long, rank long")
    r = rank_metrics(df, df, k=10).collect()[0]
    assert (r["recall_at_k"], r["mrr"], r["ndcg_at_k"]) == (1.0, 1.0, 1.0)


def test_rank_metrics_zero_overlap(spark):
    from vector_database_in_rust_spark.operators.search import rank_metrics

    truth = spark.createDataFrame(
        [(0, 1, 1)], "query_id long, vec_id long, rank long"
    )
    system = spark.createDataFrame(
        [(0, 99, 1)], "query_id long, vec_id long, rank long"
    )
    r = rank_metrics(system, truth, k=10).collect()[0]
    assert (r["recall_at_k"], r["mrr"], r["ndcg_at_k"]) == (0.0, 0.0, 0.0)
