#!/bin/bash
# Round-11 wave E: minhash_clusters re-anchors + 5M under chain
# contraction. Sweep between lanes (hygiene memory).
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
  timeout 7200 python scripts/scaling_study.py >logs/r11_anchor_mhclust_chain.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust6.log 2>&1
sweep
echo "R11 WAVE E DONE"
