"""Composed pretraining-pipeline measurement at 500k/5M docs
(round 12, verdict item 5).

Every stage of ``pipeline.pretrain_dedup_stages`` is individually
5M-measured (SCALE.md rounds 9-11); this measures the COMPOSITION —
the job a pretraining-data user actually schedules — recording
per-stage wall-clock, survivor counts, and the stage-boundary
materialization choice: ``persist_boundaries=True`` computes each
shrinking survivor corpus once and caches it; ``False`` lets Catalyst
re-fuse the curation filter into every downstream consumer's scan
(recompute instead of cache). Run both at 500k (PIPE_MODES=both), the
winner only at 5M.

Stage walls are attributed by forcing each stage with a noop sink in
dependency order — downstream stages then reuse (persist mode) or
recompute (fused mode) their inputs, which is exactly the choice being
measured; "total" is the end-to-end wall of one fresh composition
driven only by its final actions, the schedule a nightly job runs.

Usage:
  SCALING_DOC_SIZES=500000 PIPE_MODES=both python scripts/r12_pipeline.py
  SCALING_DOC_SIZES=5000000 PIPE_MODES=persist SCALING_SHUFFLE_PARTITIONS=256 \
      python scripts/r12_pipeline.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vector_database_in_rust_spark.session import get_spark  # noqa: E402

SIZES = [
    int(s)
    for s in os.environ.get("SCALING_DOC_SIZES", "500000").split(",")
]
MODES = os.environ.get("PIPE_MODES", "persist").split(",")
if MODES == ["both"]:
    MODES = ["persist", "fused"]
# docs_v2's zipf vocabulary has no English stopwords, so its quality
# scores live in ~[0.34, 0.41] (measured p5/p95 at 50k) — the testdata
# default 0.45 would gut the corpus at the gate and the downstream
# stages would measure nothing. 0.35 keeps ~85%, a realistic curation
# survival rate for an already-filtered crawl.
MIN_QUALITY = float(os.environ.get("PIPE_MIN_QUALITY", "0.35"))


def run(spark, docs, n, mode):
    from vector_database_in_rust_spark.operators.pipeline import (
        pretrain_dedup_stages,
    )

    persist = mode == "persist"
    print(f"\n=== n={n:,} mode={mode} ===", flush=True)
    t_all = time.time()
    stages = pretrain_dedup_stages(
        docs,
        min_quality=MIN_QUALITY,
        known_count=n,
        persist_boundaries=persist,
    )
    counts = {}
    for name in ("curated", "minhash", "survivors", "split", "packed"):
        t0 = time.time()
        counts[name] = stages[name].count()
        print(
            f"  {name:12s} rows={counts[name]:>9,}  {time.time()-t0:8.1f}s",
            flush=True,
        )
    total = time.time() - t_all
    print(f"  TOTAL {total:.1f}s  (mode={mode})", flush=True)
    if persist:
        for name in ("curated", "minhash", "survivors"):
            stages[name].unpersist()
    spark.catalog.clearCache()
    return total


def main() -> None:
    shuffle = os.environ.get("SCALING_SHUFFLE_PARTITIONS")
    spark = get_spark(
        app_name="r12-pipeline",
        shuffle_partitions=int(shuffle) if shuffle else None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in SIZES:
        path = f"{REPO}/spark-warehouse/scaling/docs_v2_{n}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            from vector_database_in_rust_spark.sources.synthetic import (
                generate_documents,
            )

            generate_documents(spark, n, num_partitions=32).write.mode(
                "overwrite"
            ).parquet(path)
        docs = spark.read.parquet(path)
        docs.count()  # warm footers
        for mode in MODES:
            run(spark, docs, n, mode)
    spark.stop()


if __name__ == "__main__":
    main()
