#!/bin/bash
# Round-11 wave G (post-reboot, clean box):
# 1. HierarchicalIVF at a COMPARABLE probe fraction: 27x26 = 702
#    composite cells at 500k x 384-d, nprobe=8 -> ~1.1% of the corpus
#    probed — the same fraction as the flat lane's k~sqrt(N) grid, so
#    the persisted-serving row is directly comparable to flat's
#    0.25–0.61 s band (closes the SCALE.md caveat on the r11 hier row).
# 2. ngram_clusters 500k anchor at the R=8 operating point, clean box
#    (the wave-B sample ran contended and was flagged †) — gives a
#    fixed-R 500k->5M exponent against the 1052.2 s wave-D run.
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
SPARK_DRIVER_MEM=64g SCALING_DIM=384 SCALING_VEC_SIZES=500000 \
  SCALING_ONLY=hier SCALING_HIER_K1=27 SCALING_HIER_K2=26 \
  timeout 7200 python scripts/scaling_study.py >logs/r11_hier384_g27x26.log 2>&1
sweep
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 SCALING_ONLY=ngram_clusters \
  SCALING_NGRAM_STAR=8 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_ngram_r8.log 2>&1
sweep
echo "R11 WAVE G DONE"
