#!/bin/bash
# Round-11 wave I: minhash_clusters 5M retry after the doc_id
# repartition fix (commit 68a2a3f) — the degenerate signature
# partial-aggregate was the measured scratch hog (probe:
# scripts/probe_5m_preamble.py put the preamble at only 15 GiB; the
# 5M runs died ~76 GB in at the signature stage). Re-anchor 500k on
# the same code first for a same-code exponent.
cd /root/repo || exit 1
set -x
sweep() {
  for p in $(ps -o pid=,ppid=,comm= -e | awk '$2==1 && $3=="java" {print $1}'); do kill -9 "$p"; done
  sleep 2
  for d in /tmp/blockmgr-* /tmp/spark-*; do
    [ -e "$d" ] || continue
    fuser "$d" >/dev/null 2>&1 || rm -rf "$d"
  done
  df -h / | tail -1
}
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=50000,500000 SCALING_ONLY=minhash_clusters \
  SCALING_MINHASH_EDGES=2 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_mhclust_e2i.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_MINHASH_EDGES=2 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust9.log 2>&1
sweep
echo "R11 WAVE I DONE"
