"""Measure the expr-vs-blas crossover for distributed batch ANN serving
(round 14, verdict item 1): `search_batch(impl=...)` candidate scoring.

The r13 measurements bracket the regime ends — 64-d small batches favor
the whole-stage-codegen expression form; 384-d batches favor the
cogroup matmul (2-2.5x at 1.45M candidate pairs, >=5x at ~7e8 pairs).
The router needs ONE measured threshold in estimated multiply-adds
(candidate pairs x dim), so this script sweeps query-batch size at both
dimensions and prints wall times + the est_madds each config resolves
to:

    est_madds = n_queries * nprobe * (corpus_rows / num_cells) * dim

Usage: python scripts/r14_blas_crossover.py [n64] [n384]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vector_database_in_rust_spark.session import get_spark  # noqa: E402

K = 10
NPROBE = 8


def bench(idx, queries, impl, runs=2):
    times = []
    for _ in range(runs):
        t0 = time.time()
        idx.search_batch(queries, K, nprobe=NPROBE, impl=impl).count()
        times.append(time.time() - t0)
    return times


def sweep(spark, n, dim, cells, coarse_dim, q_sizes):
    from pyspark.sql import functions as F

    from vector_database_in_rust_spark.operators.ann import IVFIndex
    from vector_database_in_rust_spark.sources.synthetic import (
        generate_vectors,
    )

    path = f"{REPO}/spark-warehouse/scaling/xover_{n}_{dim}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        generate_vectors(spark, n, dim, seed=7).write.mode(
            "overwrite"
        ).parquet(path)
    corpus = spark.read.parquet(path).persist()
    corpus.count()
    idx = IVFIndex.build(
        corpus, num_cells=cells, seed=42, coarse_dim=coarse_dim
    )
    idx.assignments = idx.assignments.persist()
    idx.assignments.count()
    avg_cell = n / cells
    print(f"\n== corpus {n} x {dim}-d, {cells} cells, nprobe={NPROBE} ==")
    for q in q_sizes:
        queries = (
            corpus.limit(q)
            .select(
                (F.col("vec_id") + 10_000_000).alias("query_id"),
                F.col("embedding").alias("query_embedding"),
            )
            .persist()
        )
        queries.count()
        madds = q * NPROBE * avg_cell * dim
        te = bench(idx, queries, "expr")
        tb = bench(idx, queries, "blas")
        print(
            f"q={q:6d} est_madds={madds:.2e} "
            f"expr={min(te):.2f}s ({te}) blas={min(tb):.2f}s ({tb})",
            flush=True,
        )
        queries.unpersist()
    idx.assignments.unpersist()
    corpus.unpersist()


def main():
    n64 = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n384 = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="blas-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    sweep(spark, n64, 64, cells=141, coarse_dim=None,
          q_sizes=(64, 256, 1024, 4096, 16384))
    sweep(spark, n384, 384, cells=100, coarse_dim=64,
          q_sizes=(32, 128, 512, 2048))
    spark.stop()


if __name__ == "__main__":
    main()
