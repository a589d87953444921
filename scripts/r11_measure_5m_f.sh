#!/bin/bash
# Round-11 wave F: minhash_clusters 5M at the budget-2 operating point
# (budget-4 expansion measured ~57 GB raw of incompressible hashed
# longs + sides > the box's 72 GB scratch). Anchor 500k at the same
# operating point for a comparable exponent.
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
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 SCALING_ONLY=minhash_clusters \
  SCALING_MINHASH_EDGES=2 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_mhclust_e2.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_MINHASH_EDGES=2 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust7.log 2>&1
sweep
echo "R11 WAVE F DONE"
