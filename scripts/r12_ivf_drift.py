"""Incremental-ingest drift study for the IVF index (round 12, verdict
item 6).

``assign_new`` (ann.py) ingests new vectors against the EXISTING
centroids — the capability the reference lacks entirely (its graph is
build-once per process, src/lib.rs:336-341). Tested for correctness
since r8 but never measured as a POLICY: what decays as drifted data
accumulates, and when must the operator repair?

Protocol: build on a 500k planted-cluster base (centers 0..499), then
ingest K batches of out-of-distribution vectors (NEW centers 500..999
— the adversarial shift: nothing in the base fit represents them).
After each batch, against a FIXED drifted query set, record:

- occupancy (cells, max_share, p99) — the production-observable
  signal (``occupancy_stats``; no ground truth needed);
- recall@10 of ``search_batch`` (nprobe=8) vs exact ``knn_batch``
  over the CURRENT corpus — the quality signal;
- mean probed-rows fraction — the cost signal (rows in the probed
  cells / corpus rows, computed from cell stats + the driver-side
  probe lists).

The final step runs the two repairs on the drifted index —
``split_hot_cells()`` and a full rebuild — and records the same
metrics, pricing the repair options. The resulting trigger rule is
pinned as ``ann.rebuild_due`` and tested; SCALE.md r12 records the
curve.

Usage: python scripts/r12_ivf_drift.py [base_n] [batches] [batch_n]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vector_database_in_rust_spark.session import get_spark  # noqa: E402

DIM = 64
N_CLUSTERS = 500  # per regime: base uses 0..499, drift uses 500..999
SEED = 11
K = 10
N_QUERIES = 16
NPROBE = 8


def clustered(spark, n, *, id_start, label_start, n_modes=N_CLUSTERS):
    """Planted-cluster corpus, same construction as
    scripts/recall_ladder_384.py but 64-d and with a label offset so
    the drift regime's centers are disjoint from the base's.
    ``n_modes`` narrows the regime: a realistic domain shift (a new
    crawl source, a new language) is a FEW new modes, not a uniform
    re-draw — concentration is what stresses the fixed centroid set."""

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), DIM), dtype=np.float32)
            for j, vid in enumerate(ids):
                label = label_start + (int(vid) % n_modes)
                center = np.random.RandomState(
                    SEED * 1000003 + label
                ).standard_normal(DIM) * 4.0
                noise = np.random.RandomState(
                    SEED * 7919 + int(vid) + id_start
                ).standard_normal(DIM)
                out[j] = (center + noise).astype(np.float32)
            yield pd.DataFrame(
                {"vec_id": ids + id_start, "embedding": list(out)}
            )

    return spark.range(n, numPartitions=32).mapInPandas(
        gen, "vec_id BIGINT, embedding ARRAY<FLOAT>"
    )


def _recall(exact_rows, ann_rows) -> float:
    e, a = {}, {}
    for r in exact_rows:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in ann_rows:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    return sum(len(e[q] & a.get(q, set())) / len(e[q]) for q in e) / len(e)


def probed_fraction(idx, queries_rows, nprobe) -> float:
    """Mean over queries of rows-in-probed-cells / corpus rows."""
    occ = {r["cell_id"]: r["n_vectors"] for r in idx.cell_stats().collect()}
    total = sum(occ.values())
    fr = []
    for r in queries_rows:
        cells = idx._probe_cells(
            [float(x) for x in r["query_embedding"]], nprobe
        )
        fr.append(sum(occ.get(c, 0) for c in cells) / total)
    return sum(fr) / len(fr)


def evaluate(tag, idx, corpus, queries, queries_rows, exact_rows):
    from vector_database_in_rust_spark.operators.ann import rebuild_due

    occ = idx.occupancy_stats()
    t0 = time.time()
    ann = idx.search_batch(queries, K, nprobe=NPROBE).collect()
    dt = time.time() - t0
    r = _recall(exact_rows, ann)
    pf = probed_fraction(idx, queries_rows, NPROBE)
    due = rebuild_due(occ)
    print(
        f"| {tag} | {occ['cells']} | {occ['max_share']:.4f} | "
        f"{occ['p99']} | {pf:.4f} | {r:.3f} | {dt:.2f} | {due} |",
        flush=True,
    )
    return occ, r, pf


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else base_n // 8
    spark = get_spark(app_name="ivf-drift")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from vector_database_in_rust_spark.operators.ann import IVFIndex
    from vector_database_in_rust_spark.operators.knn import knn_batch

    base_path = f"{REPO}/spark-warehouse/scaling/drift_base_{base_n}"
    if not os.path.exists(os.path.join(base_path, "_SUCCESS")):
        clustered(spark, base_n, id_start=0, label_start=0).write.mode(
            "overwrite"
        ).parquet(base_path)
    base = spark.read.parquet(base_path).persist()
    base.count()

    # fixed drifted query set: 16 vectors from the NEW regime, ids far
    # beyond any corpus id so self-matches cannot mask recall
    drift_modes = int(os.environ.get("DRIFT_MODES", "20"))
    qdf_src = clustered(
        spark, N_QUERIES, id_start=10**9, label_start=N_CLUSTERS,
        n_modes=drift_modes,
    )
    queries = qdf_src.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    ).persist()
    queries_rows = queries.collect()

    t0 = time.time()
    idx = IVFIndex.build(base, seed=42)
    idx.assignments = idx.assignments.persist()
    idx.assignments.count()
    print(f"base build ({base_n:,} rows): {time.time() - t0:.1f}s",
          flush=True)

    print("\n| step | cells | max_share | p99 | probed_frac | "
          "recall@10 | search s | rebuild_due |")
    print("|---|---|---|---|---|---|---|---|")

    corpus = base
    exact = knn_batch(corpus, queries, K, impl="pandas").collect()
    evaluate("base", idx, corpus, queries, queries_rows, exact)

    for step in range(1, batches + 1):
        batch = clustered(
            spark,
            batch_n,
            id_start=base_n + (step - 1) * batch_n,
            label_start=N_CLUSTERS,
            n_modes=drift_modes,
        ).persist()
        batch.count()
        t0 = time.time()
        idx = idx.assign_new(batch)
        idx.assignments = idx.assignments.persist()
        idx.assignments.count()
        ingest_s = time.time() - t0
        corpus = corpus.unionByName(batch).persist()
        exact = knn_batch(corpus, queries, K, impl="pandas").collect()
        evaluate(
            f"+{step}x{batch_n // 1000}k ({ingest_s:.1f}s ingest)",
            idx, corpus, queries, queries_rows, exact,
        )

    # repairs on the fully drifted index
    t0 = time.time()
    repaired = idx.split_hot_cells(seed=42)
    repaired.assignments = repaired.assignments.persist()
    repaired.assignments.count()
    print(f"\nsplit_hot_cells: {time.time() - t0:.1f}s", flush=True)
    evaluate("split_hot", repaired, corpus, queries, queries_rows, exact)

    t0 = time.time()
    rebuilt = IVFIndex.build(corpus, seed=42)
    rebuilt.assignments = rebuilt.assignments.persist()
    rebuilt.assignments.count()
    print(f"full rebuild: {time.time() - t0:.1f}s", flush=True)
    evaluate("rebuild", rebuilt, corpus, queries, queries_rows, exact)
    spark.stop()


if __name__ == "__main__":
    main()
