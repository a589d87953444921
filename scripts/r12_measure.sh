#!/bin/bash
# Round-12 measurement wave, sequential with orphan-JVM sweeps between
# lanes (the box-profile discipline):
#   A. HierarchicalIVF at 5M x 384-d: build + persisted pruned serve +
#      recall floor (verdict item 3)
#   B. Composed pretraining pipeline at 500k, persist vs fused
#      boundaries (verdict item 5)
#   C. Composed pipeline at 5M, persist mode, 256 shuffle partitions
#      (the 5M-doc discipline)
#   D. IVF incremental-ingest drift study at 500k base (verdict item 6)
cd /root/repo || exit 1
mkdir -p logs
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
SPARK_DRIVER_MEM=64g timeout 7200 \
  python scripts/r12_hier_384_5m.py 5000000 >logs/r12_hier384_5m.log 2>&1
sweep
timeout 3600 env SCALING_DOC_SIZES=500000 PIPE_MODES=both \
  python scripts/r12_pipeline.py >logs/r12_pipeline_500k.log 2>&1
sweep
SPARK_DRIVER_MEM=64g timeout 7200 \
  env SCALING_DOC_SIZES=5000000 PIPE_MODES=persist SCALING_SHUFFLE_PARTITIONS=256 \
  python scripts/r12_pipeline.py >logs/r12_pipeline_5m.log 2>&1
sweep
timeout 3600 python scripts/r12_ivf_drift.py 500000 8 62500 \
  >logs/r12_drift_500k.log 2>&1
sweep
echo "R12 WAVE DONE"
