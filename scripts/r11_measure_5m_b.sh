#!/bin/bash
# Round-11 5M wave B: minhash_clusters re-anchors + 5M under the
# hashed-verification fix, plus a fixed-R ngram_clusters 500k anchor
# (the wave-A anchors ran R=16 while the 5M row ran R=8 — this pins
# the same-operating-point exponent). Orphan-scratch sweep between
# lanes (hygiene memory).
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
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=50000,500000 \
  SCALING_ONLY=minhash_clusters \
  timeout 7200 python scripts/scaling_study.py >logs/r11_anchor_mhclust_hashed.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 SCALING_ONLY=ngram_clusters \
  SCALING_NGRAM_STAR=8 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_ngclust_r8.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust3.log 2>&1
sweep
echo "R11 5M WAVE B DONE"
