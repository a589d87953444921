"""384-d end-to-end semantic-dedup rehearsal (round 11, verdict item 7).

The dedup scaling studies run at 64-d (structure-free normals) and the
ANN coarse_dim fix was validated on a 384-d planted-cluster corpus
(scripts/recall_ladder_384.py) — this script closes the loop between
the two: run the DEDUP CONSUMER of the reduced-geometry fix
(``semantic_dedup(coarse_dim=64)``) at the reference's own 384-d
(generate_mock_data.py:5-7) on the same planted-cluster corpus, and
hold it to the verdict's independent full-dimension BLAS re-check
(kept_valid / dropped_valid — the precision floor) plus a recall floor
computed against the corpus's OWN planted structure (every vec_id is a
member of cluster vec_id % N_CLUSTERS; within-cluster cosine ~0.94 at
this geometry, cross-cluster ~0, so at threshold 0.8 each planted
cluster must collapse to ~1 kept representative).

Timings feed SCALE.md's measured table; booleans are the correctness
record. Usage: python scripts/semdedup_384_rehearsal.py [n_vectors]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vector_database_in_rust_spark.session import get_spark  # noqa: E402
from scripts.recall_ladder_384 import planted_clusters, DIM, N_CLUSTERS  # noqa: E402

COARSE = 64
THRESHOLD = 0.8


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark(app_name="semdedup-384-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from vector_database_in_rust_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_verdict,
    )

    path = f"{REPO}/spark-warehouse/scaling/planted_v1_{n}_d{DIM}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        planted_clusters(spark, n).write.mode("overwrite").parquet(path)
    emb = spark.read.parquet(path)
    emb.count()  # warm scan

    t0 = time.time()
    decisions = semantic_dedup(
        emb, threshold=THRESHOLD, seed=42, coarse_dim=COARSE
    ).persist()
    kept = decisions.filter(F.col("keep")).count()
    total = decisions.count()
    t_dedup = time.time() - t0
    print(
        f"semantic_dedup n={n} dim={DIM} coarse_dim={COARSE} "
        f"threshold={THRESHOLD}: {t_dedup:.1f}s, kept {kept}/{total} "
        f"({kept / max(total, 1):.4f})"
    )

    # Recall floor against the PLANTED structure: each of the
    # N_CLUSTERS planted clusters holds n/N_CLUSTERS near-dup members
    # (within-cluster cosine ~0.94 >> threshold); a working dedup keeps
    # only a few representatives per planted cluster. Ceiling of 3
    # allows clustering boundary effects (a planted cluster split
    # across 2-3 coarse cells keeps one rep per cell).
    per_planted = (
        decisions.filter(F.col("keep"))
        .withColumn("_planted", F.col("vec_id") % N_CLUSTERS)
        .groupBy("_planted")
        .agg(F.count(F.lit(1)).alias("kept"))
        .agg(
            F.max("kept").alias("max_kept"),
            F.avg("kept").alias("avg_kept"),
            F.count(F.lit(1)).alias("planted_seen"),
        )
        .first()
    )
    print(
        f"planted-cluster recall: avg kept/cluster "
        f"{per_planted['avg_kept']:.2f}, max {per_planted['max_kept']}, "
        f"clusters represented {per_planted['planted_seen']}/{N_CLUSTERS}"
    )
    recall_ok = (
        per_planted["planted_seen"] == N_CLUSTERS
        and per_planted["avg_kept"] <= 3.0
    )
    decisions.unpersist()

    t0 = time.time()
    row = semantic_dedup_verdict(
        emb, threshold=THRESHOLD, seed=42, coarse_dim=COARSE
    ).first()
    t_verdict = time.time() - t0
    print(f"verdict ({t_verdict:.1f}s): {row.asDict()}")
    precision_ok = bool(
        row["kept_valid"] and row["dropped_valid"] and row["some_dropped"]
        and row["ids_unique"] and row["n_total"] == n
    )
    print(f"RESULT precision_ok={precision_ok} recall_ok={recall_ok}")
    spark.stop()
    sys.exit(0 if (precision_ok and recall_ok) else 1)


if __name__ == "__main__":
    main()
