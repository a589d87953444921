"""Re-run of the r12 drift-protocol tail under fraction-expressed
serving budgets (round 13, verdict item 2).

The r12 study (scripts/r12_ivf_drift.py, SCALE.md r12) ended on a
footgun: the recommended `rebuild_due`-triggered FULL REBUILD changed
the cell count (707 -> 1000 at 1M rows), so serving the rebuilt index
at the SAME absolute nprobe=8 probed half the fraction and recall fell
0.994 -> 0.856. This script re-runs exactly that tail with the round-13
`target_frac` budget and records the closing measurement:

1. build on the 500k planted base, ingest the same 8 OOD batches
   (identical generators/seeds as r12_ivf_drift);
2. measure the drifted index's serve at nprobe=8 and record its
   PROBED-CELL FRACTION f0 = 8 / num_cells;
3. full rebuild over the drifted corpus (same seed discipline);
4. serve the rebuilt index BOTH ways: stale absolute nprobe=8 (the
   measured footgun) and target_frac=f0 (the fix) — the claim is
   recall(target_frac=f0) >= recall(pre-rebuild), while nprobe=8
   reproduces the drop.

Usage: python scripts/r13_rebuild_frac.py [base_n] [batches] [batch_n]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.r12_ivf_drift import (  # noqa: E402
    K, N_CLUSTERS, N_QUERIES, NPROBE, _recall, clustered, probed_fraction,
)
from vector_database_in_rust_spark.session import get_spark  # noqa: E402


def main() -> None:
    base_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else base_n // 8
    spark = get_spark(app_name="rebuild-frac")
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

    drift_modes = int(os.environ.get("DRIFT_MODES", "20"))
    queries = clustered(
        spark, N_QUERIES, id_start=10**9, label_start=N_CLUSTERS,
        n_modes=drift_modes,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    ).persist()
    queries_rows = queries.collect()

    t0 = time.time()
    idx = IVFIndex.build(base, seed=42)
    idx.assignments = idx.assignments.persist()
    idx.assignments.count()
    print(f"base build ({base_n:,}): {time.time() - t0:.1f}s", flush=True)

    corpus = base
    for step in range(1, batches + 1):
        batch = clustered(
            spark, batch_n, id_start=base_n + (step - 1) * batch_n,
            label_start=N_CLUSTERS, n_modes=drift_modes,
        )
        idx = idx.assign_new(batch)
        corpus = corpus.unionByName(batch)
    idx.assignments = idx.assignments.persist()
    idx.assignments.count()
    corpus = corpus.persist()
    corpus.count()
    print(f"ingested {batches}x{batch_n:,} OOD rows", flush=True)

    exact = knn_batch(corpus, queries, K, impl="pandas").collect()

    def serve(tag, i, **kw):
        t0 = time.time()
        ann = i.search_batch(queries, K, **kw).collect()
        dt = time.time() - t0
        r = _recall(exact, ann)
        np_eff = kw.get("nprobe") or i.nprobe_for_frac(kw["target_frac"])
        pf = probed_fraction(i, queries_rows, np_eff)
        print(
            f"| {tag} | {i.num_cells} | {np_eff} | {pf:.4f} | "
            f"{r:.3f} | {dt:.2f} |",
            flush=True,
        )
        return r

    print("\n| serve | cells | nprobe_eff | probed_rows_frac | "
          "recall@10 | s |")
    print("|---|---|---|---|---|---|")
    f0 = NPROBE / idx.num_cells
    r_pre = serve("drifted, nprobe=8", idx, nprobe=NPROBE)

    t0 = time.time()
    rebuilt = IVFIndex.build(corpus, seed=42)
    rebuilt.assignments = rebuilt.assignments.persist()
    rebuilt.assignments.count()
    print(f"full rebuild: {time.time() - t0:.1f}s "
          f"({idx.num_cells} -> {rebuilt.num_cells} cells)", flush=True)

    f_rows_pre = probed_fraction(idx, queries_rows, NPROBE)
    r_stale = serve("rebuilt, STALE nprobe=8", rebuilt, nprobe=NPROBE)
    r_cellfrac = serve(
        f"rebuilt, cell-frac={f0:.4f}", rebuilt, target_frac=f0
    )
    # The honest matched-budget comparison is the probed ROWS fraction
    # (the true serve cost): the drifted index's hot cells inflate its
    # rows fraction above its cell fraction, so matching cells alone
    # under-spends on the (balanced) rebuilt index. On a balanced index
    # cell fraction ~ rows fraction, so target the drifted rows frac.
    r_rowsfrac = serve(
        f"rebuilt, rows-frac={f_rows_pre:.4f}", rebuilt,
        target_frac=min(1.0, f_rows_pre),
    )
    print(
        f"\nverdict: pre={r_pre:.3f}@rows{f_rows_pre:.4f} "
        f"stale={r_stale:.3f} cell-matched={r_cellfrac:.3f} "
        f"rows-matched={r_rowsfrac:.3f} -> "
        f"{'HOLDS' if r_rowsfrac >= r_pre - 0.005 else 'FAILS'} "
        "(claim: a fraction-expressed budget at the matched probed "
        "fraction holds recall across the rebuild)",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
