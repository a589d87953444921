#!/bin/bash
# Round-11 wave M: HierarchicalIVF ladder at 64-d on the flat lanes'
# own decades (500k, 5M vectors), grid 47x47 = 2209 composite cells
# at 5M (flat's k~sqrt(N) cell count; nprobe=8 probes ~0.36% like
# flat) — extends the hier story beyond the single 500k x 384-d row.
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
SPARK_DRIVER_MEM=64g SCALING_VEC_SIZES=500000 \
  SCALING_ONLY=hier SCALING_HIER_K1=27 SCALING_HIER_K2=26 \
  timeout 3600 python scripts/scaling_study.py >logs/r11_hier64_500k.log 2>&1
sweep
SPARK_DRIVER_MEM=64g SCALING_VEC_SIZES=5000000 \
  SCALING_ONLY=hier SCALING_HIER_K1=47 SCALING_HIER_K2=47 \
  timeout 7200 python scripts/scaling_study.py >logs/r11_hier64_5m.log 2>&1
sweep
echo "R11 WAVE M DONE"
