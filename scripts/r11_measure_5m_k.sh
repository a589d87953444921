#!/bin/bash
# Round-11 wave K: minhash_clusters 5M at the DEFAULT budget-4
# operating point — the doc_id alignment freed ~30 GB of the scratch
# the budget cut was protecting; if this completes, the 5M row needs
# no operating-point caveat at all.
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
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_MINHASH_EDGES=4 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust10.log 2>&1
sweep
echo "R11 WAVE K DONE"
