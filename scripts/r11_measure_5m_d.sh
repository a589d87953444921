#!/bin/bash
# Round-11 wave D: minhash_clusters 5M under edge budget + partition-
# aware hash join; ngram_clusters 5M re-run under the same policy for
# a comparable row. Sweep between lanes (hygiene memory).
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
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust5.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_NGRAM_STAR=8 \
  timeout 10800 python scripts/scaling_study.py >logs/r11_5m_ngclust3.log 2>&1
sweep
echo "R11 WAVE D DONE"
