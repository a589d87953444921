"""Hierarchical-index twin of the r12 ingest-drift study.

Same protocol as scripts/r12_ivf_drift.py (500k planted base, K
out-of-distribution batches from 20 new modes, fixed drifted queries,
nprobe=8) but on ``HierarchicalIVF`` via the round-12 ``assign_new``
— measuring whether the two-level structure decays like the flat one
under the same drift (it should: composite cells are cells) and what
the ingest pass itself costs at the serving-scale cell count. Hier
has no split_hot_cells/rebalance repair; its measured options are
ingest-until-trigger then rebuild.

Usage: python scripts/r12_hier_drift.py [base_n] [batches] [batch_n]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.r12_ivf_drift import (  # noqa: E402
    DIM, K, N_CLUSTERS, N_QUERIES, NPROBE, _recall, clustered,
)
from vector_database_in_rust_spark.session import get_spark  # noqa: E402


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else base_n // 4
    spark = get_spark(app_name="hier-drift")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from vector_database_in_rust_spark.operators.ann import (
        HierarchicalIVF,
        rebuild_due,
    )
    from vector_database_in_rust_spark.operators.knn import knn_batch

    base_path = f"{REPO}/spark-warehouse/scaling/drift_base_{base_n}"
    if not os.path.exists(os.path.join(base_path, "_SUCCESS")):
        clustered(spark, base_n, id_start=0, label_start=0).write.mode(
            "overwrite"
        ).parquet(base_path)
    base = spark.read.parquet(base_path).persist()
    base.count()

    drift_modes = int(os.environ.get("DRIFT_MODES", "20"))
    queries = clustered(
        spark, N_QUERIES, id_start=10**9, label_start=N_CLUSTERS,
        n_modes=drift_modes,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    ).persist()
    queries.collect()

    t0 = time.time()
    idx = HierarchicalIVF.build(base, k1=27, k2=26, seed=42)
    idx.assignments = idx.assignments.persist()
    idx.assignments.count()
    print(f"hier base build (27x26): {time.time() - t0:.1f}s", flush=True)

    def occ_stats(i):
        row = (
            i.assignments.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)).alias("cells"), F.max("n").alias("max"),
                 F.sum("n").alias("rows"),
                 F.expr("percentile_approx(n, 0.99)").alias("p99"))
            .first()
        )
        total = int(row["rows"] or 0)
        return {
            "cells": int(row["cells"] or 0),
            "rows": total,
            "max": int(row["max"] or 0),
            "p99": int(row["p99"] or 0),
            "max_share": (int(row["max"] or 0) / total) if total else 0.0,
        }

    base_occ = occ_stats(idx)

    def evaluate(tag, i, exact):
        occ = occ_stats(i)
        t0 = time.time()
        ann = i.search_batch(queries, K, nprobe=NPROBE).collect()
        dt = time.time() - t0
        print(
            f"| {tag} | {occ['cells']} | {occ['max_share']:.4f} | "
            f"{occ['p99']} | {_recall(exact, ann):.3f} | {dt:.2f} | "
            f"{rebuild_due(occ, baseline=base_occ)} |",
            flush=True,
        )

    print("\n| step | cells | max_share | p99 | recall@10 | search s | "
          "rebuild_due(growth) |")
    print("|---|---|---|---|---|---|---|")
    corpus = base
    exact = knn_batch(corpus, queries, K, impl="pandas").collect()
    evaluate("base", idx, exact)
    for step in range(1, batches + 1):
        batch = clustered(
            spark, batch_n,
            id_start=base_n + (step - 1) * batch_n,
            label_start=N_CLUSTERS, n_modes=drift_modes,
        ).persist()
        batch.count()
        t0 = time.time()
        idx = idx.assign_new(batch)
        idx.assignments = idx.assignments.persist()
        idx.assignments.count()
        ingest_s = time.time() - t0
        corpus = corpus.unionByName(batch).persist()
        exact = knn_batch(corpus, queries, K, impl="pandas").collect()
        evaluate(f"+{step}x{batch_n // 1000}k ({ingest_s:.1f}s ingest)",
                 idx, exact)
    spark.stop()


if __name__ == "__main__":
    main()
