#!/bin/bash
# Round-11 wave L: the exact ngram-Jaccard PAIR contract at 5M — the
# r9/r10 double-DNF lane — retried after the doc_id alignment freed
# the sa exchange + sizes partials (~15-20 GB) from the
# candidate-verification peak that measured ~68 GB on a 72 GB-free
# box in r10.
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
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_jaccard \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 10800 python scripts/scaling_study.py >logs/r11_5m_ngrampairs3.log 2>&1
sweep
echo "R11 WAVE L DONE"
