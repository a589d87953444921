#!/bin/bash
# Round-11 wave H: minhash_clusters 5M retry after the hashed-persist
# fix (commit c002d54) — the wave-F budget-2 run ENOSPC'd on this
# box's ~79 GB usable scratch with the STRING shingle index persisted
# (~30 GB of it cache spill). Re-anchor 500k on the new code first so
# the exponent is same-code.
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
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_mhclust_e2h.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_MINHASH_EDGES=2 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust8.log 2>&1
sweep
echo "R11 WAVE H DONE"
