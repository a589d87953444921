"""Measure the ANN surface's recall@10 vs knn_exact at a fixed setting
grid on sf0.01 — the tracked-metric table published in the round notes
(r4 verdict item 8: the pass/fail bars in tests/test_ann.py become a
regressable table).

Usage: python scripts/ann_recall_table.py [sf_dir]   (prints markdown)
"""

from __future__ import annotations

import sys

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
from vector_database_in_rust_spark.session import get_spark

K = 10
N_QUERIES = 16
SEED = 42


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()

    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    qvecs = {
        r["query_id"]: [float(x) for x in r["query_embedding"]]
        for r in queries.collect()
    }
    exact = {}
    for r in knn_batch(emb, queries, K).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_batch(df) -> float:
        got = {}
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

    rows: list[tuple[str, str, float]] = []

    ivf16 = IVFIndex.build(emb, num_cells=16, seed=SEED)
    for nprobe in (4, 8, 10, 16):
        rows.append(
            (
                "IVF flat (16 cells)",
                f"nprobe={nprobe}",
                recall_batch(ivf16.search_batch(queries, K, nprobe=nprobe)),
            )
        )

    hier = HierarchicalIVF.build(emb, k1=8, k2=8, seed=SEED)
    for l1, np_ in ((2, 8), (3, 8), (8, 64)):
        rows.append(
            (
                "Hierarchical IVF (8x8)",
                f"nprobe_l1={l1}, nprobe={np_}",
                recall_per_query(
                    lambda v, l1=l1, np_=np_: hier.search(
                        v, K, nprobe_l1=l1, nprobe=np_
                    )
                ),
            )
        )

    pq = IVFPQIndex.build(ivf16, m=8, ksub=16, seed=SEED)
    for refine in (0, 4, 16):
        rows.append(
            (
                "IVF-PQ (m=8, ksub=16)",
                f"nprobe=16, refine={refine}",
                recall_per_query(
                    lambda v, r=refine: pq.search(
                        v, K, nprobe=16, refine=r, store=emb if r else None
                    )
                ),
            )
        )

    lsh = MultiProbeLSH.build(emb, n_tables=8, width=4.0, seed=SEED)
    for radius in (0, 1):
        rows.append(
            (
                "Multi-probe LSH (8 tables)",
                f"radius={radius}",
                recall_per_query(
                    lambda v, rad=radius: lsh.search(
                        v, K, emb, probe_radius=rad
                    )
                ),
            )
        )

    for rf in (4, 16):
        rows.append(
            (
                "BQ funnel (Hamming->exact)",
                f"refine_factor={rf}",
                recall_per_query(
                    lambda v, rf=rf: knn_refine_bq(emb, v, K, refine_factor=rf)
                ),
            )
        )

    rows.append(
        (
            "Matryoshka funnel",
            "prefix=16, refine_factor=4",
            recall_per_query(
                lambda v: knn_funnel(emb, v, K, prefix_dim=16, refine_factor=4)
            ),
        )
    )

    rows.append(
        (
            "Exact scan (control)",
            "-",
            recall_per_query(lambda v: knn_exact(emb, v, K)),
        )
    )

    print(f"\nrecall@{K} vs knn_exact, {len(qvecs)} self-queries, "
          f"n={n} ({sf_dir}), seed={SEED}\n")
    print("| method | setting | recall@10 |")
    print("|---|---|---|")
    for method, setting, r in rows:
        print(f"| {method} | {setting} | {r:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
