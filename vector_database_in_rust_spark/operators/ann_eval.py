"""Recall-measurement harness for the ANN surface — the tracked-metric
table published in the round notes and enforced by
tests/test_ann_recall.py (r5 verdict item 4: the published table
becomes a regression gate; any recall row dropping fails pytest).

Two corpora, same grid:

* the driver's ``embeddings.parquet`` — i.i.d. uniform, structure-FREE:
  the worst case for any cell-pruning ANN (recall tracks the probed
  fraction by design). Keeps the grid honest as the adversarial control.
* :func:`structured_embeddings` — planted clusters + MRL-style
  geometrically decaying per-dimension variance, the shape real trained
  embedding models produce (cluster structure makes cell pruning
  informative; leading-dimension energy is the property Matryoshka
  training provides, arXiv:2205.13147). Measures the operators rather
  than the worst case (r5 verdict item 6).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_database_in_rust_spark.operators.ann import (
    HierarchicalIVF,
    IVFIndex,
    IVFPQIndex,
    MultiProbeLSH,
)
from vector_database_in_rust_spark.operators.knn import (
    knn_batch,
    knn_exact,
    knn_funnel,
    knn_refine_bq,
)

K = 10
N_QUERIES = 16
SEED = 42


def structured_embeddings(
    spark: SparkSession,
    *,
    n: int = 500,
    dim: int = 64,
    n_clusters: int = 10,
    noise: float = 0.25,
    decay: float = 0.93,
    seed: int = 7,
) -> DataFrame:
    """Deterministic structure-bearing synthetic corpus: points drawn
    around ``n_clusters`` Gaussian centers (cluster separation >> noise,
    so IVF cells align with real structure), then every dimension ``d``
    scaled by ``decay**d`` so leading dimensions carry most of the
    energy — the Matryoshka property a prefix-truncating funnel relies
    on. Same (vec_id, embedding) schema as the driver's parquet."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    labels = rng.randint(0, n_clusters, size=n)
    pts = (centers[labels] + noise * rng.randn(n, dim)) * decay ** np.arange(dim)
    rows = [(int(i), [float(x) for x in pts[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def recall_grid(emb: DataFrame) -> dict[tuple[str, str], float]:
    """recall@10 vs knn_exact for every (method, setting) in the tracked
    grid, over the first N_QUERIES self-queries of ``emb``."""
    emb = emb.cache()
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    qvecs = {
        r["query_id"]: [float(x) for x in r["query_embedding"]]
        for r in queries.collect()
    }
    exact: dict[int, set[int]] = {}
    for r in knn_batch(emb, queries, K).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_batch(df) -> float:
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(
            len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)

    def recall_per_query(search_fn) -> float:
        tot = 0.0
        for qid, vec in qvecs.items():
            ids = {r["vec_id"] for r in search_fn(vec).collect()}
            tot += len(exact[qid] & ids) / len(exact[qid])
        return tot / len(qvecs)

    out: dict[tuple[str, str], float] = {}

    ivf16 = IVFIndex.build(emb, num_cells=16, seed=SEED)
    # Build once, probe many: without the persist every per-query
    # search re-runs the full corpus assignment pass (the same contract
    # harness._ivf_index/_hier_index follow).
    ivf16.assignments = ivf16.assignments.persist()
    for nprobe in (4, 8, 10, 16):
        out[("IVF flat (16 cells)", f"nprobe={nprobe}")] = recall_batch(
            ivf16.search_batch(queries, K, nprobe=nprobe)
        )

    hier = HierarchicalIVF.build(emb, k1=8, k2=8, seed=SEED)
    hier.assignments = hier.assignments.persist()
    # (3, 8) is kept as the documented LOW-budget point (12.5% of the
    # corpus probed — recall tracks that fraction on uniform data);
    # (None, None) is the tuned default = flat-equivalent budget.
    for l1, np_ in ((3, 8), (None, None), (8, 64)):
        label = "default (k1, total/2)" if l1 is None else f"nprobe_l1={l1}, nprobe={np_}"
        out[("Hierarchical IVF (8x8)", label)] = recall_per_query(
            lambda v, a=l1, b=np_: hier.search(v, K, nprobe_l1=a, nprobe=b)
        )

    pq = IVFPQIndex.build(ivf16, m=8, ksub=16, seed=SEED)
    for refine in (0, 4, 16):
        out[("IVF-PQ (m=8, ksub=16)", f"nprobe=16, refine={refine}")] = (
            recall_per_query(
                lambda v, r=refine: pq.search(
                    v, K, nprobe=16, refine=r, store=emb if r else None
                )
            )
        )

    lsh = MultiProbeLSH.build(emb, n_tables=8, width=4.0, seed=SEED)
    for radius in (0, 1):
        out[("Multi-probe LSH (8 tables)", f"radius={radius}")] = (
            recall_per_query(
                lambda v, rad=radius: lsh.search(v, K, emb, probe_radius=rad)
            )
        )

    for rf in (4, 16):
        out[("BQ funnel (Hamming->exact)", f"refine_factor={rf}")] = (
            recall_per_query(
                lambda v, r=rf: knn_refine_bq(emb, v, K, refine_factor=r)
            )
        )

    out[("Matryoshka funnel", "prefix=16, refine_factor=4")] = recall_per_query(
        lambda v: knn_funnel(emb, v, K, prefix_dim=16, refine_factor=4)
    )

    out[("Exact scan (control)", "-")] = recall_per_query(
        lambda v: knn_exact(emb, v, K)
    )
    ivf16.assignments.unpersist()
    hier.assignments.unpersist()
    emb.unpersist()
    return out
