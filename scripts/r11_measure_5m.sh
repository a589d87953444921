#!/bin/bash
# Round-11 5M re-runs on a CLEAN box (the first attempt ran against
# ~23 GB of scratch because earlier lanes' killed JVMs leaked ~70 GB
# of /tmp/blockmgr-* dirs — hygiene lesson recorded in NOTES_r11).
# Orphan-scratch sweep between lanes so each 5M lane gets the full
# headroom.
cd /root/repo || exit 1
set -x

sweep() {
  for d in /tmp/blockmgr-* /tmp/spark-*; do
    [ -e "$d" ] || continue
    fuser "$d" >/dev/null 2>&1 || rm -rf "$d"
  done
  df -h / | tail -1
}

sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_NGRAM_STAR=8 \
  timeout 10800 python scripts/scaling_study.py >logs/r11_5m_ngclust2.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust2.log 2>&1
sweep
echo "R11 5M RERUNS DONE"
