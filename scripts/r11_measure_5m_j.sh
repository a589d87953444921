#!/bin/bash
# Round-11 wave J: ngram_clusters same-box fixed-R ladder after the
# doc_id alignment (commit 2cc9e84) — 500k anchor + 5M, both at the
# R=8 operating point on the post-reboot box, giving a single-box
# single-code 500k->5M exponent (the wave-D 1052.2 s row predates
# the reboot and the alignment).
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
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=50000,500000 SCALING_ONLY=ngram_clusters \
  SCALING_NGRAM_STAR=8 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_ngram_r8j.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_NGRAM_STAR=8 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_ngram3.log 2>&1
sweep
echo "R11 WAVE J DONE"
