#!/bin/bash
# Round-11 measurement pipeline (requires an uncontended box — timings
# feed SCALE.md's measured table). Each lane is its own process so an
# OOM/timeout loses only that lane. Logs under logs/.
#
# Hygiene (memory: measurement-hygiene): warm-up lane first and
# untabled; same-round anchors for every op pushed to 5M; nothing else
# may run during a lane; check `df -h /` headroom before the 5M
# verification-expansion lanes (~49 GB free at composition time — the
# ngram_clusters 5M operating point R is sized against the measured
# 500k expansion, lane 6 gates on lane 3's log).
cd /root/repo || exit 1
mkdir -p logs
set -x

# 0. Warm-up (cold-box absorber; NEVER tabled).
SPARK_DRIVER_MEM=16g SCALING_DOC_SIZES=50000 SCALING_ONLY=dedup_exact \
  timeout 1800 python scripts/scaling_study.py >logs/r11_warmup.log 2>&1

# 1. Bench re-anchor, uncontended, median of 3 (verdict item 5:
#    adjudicate the +43% top_customers_by_region drift).
for i in 1 2 3; do
  timeout 1800 python bench.py >logs/r11_bench_$i.json 2>logs/r11_bench_$i.log
done

# 2-3. Same-round anchors for the two clique ops headed to 5M.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=50000 \
  SCALING_ONLY=minhash_clusters,ngram_clusters \
  timeout 3600 python scripts/scaling_study.py >logs/r11_anchor_50k.log 2>&1
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 \
  SCALING_ONLY=minhash_clusters,ngram_clusters \
  timeout 7200 python scripts/scaling_study.py >logs/r11_anchor_500k.log 2>&1

# 4. Hier persisted serving + build at the reference's own 384-d
#    (verdict item 3's measurement half; corpus already staged r10).
SPARK_DRIVER_MEM=64g SCALING_DIM=384 SCALING_VEC_SIZES=500000 \
  SCALING_ONLY=hier \
  timeout 7200 python scripts/scaling_study.py >logs/r11_hier384.log 2>&1

# 5. 384-d end-to-end semantic-dedup rehearsal (verdict item 7):
#    planted-cluster corpus, coarse_dim geometry, precision (verdict
#    booleans) + planted recall floor.
SPARK_DRIVER_MEM=64g timeout 7200 \
  python scripts/semdedup_384_rehearsal.py 500000 >logs/r11_semdedup384.log 2>&1

# 6. ngram_clusters @5M — the round's contract headline (verdict item
#    1): the decade where the exact pair contract DNF'd twice. R=8
#    halves the star-edge budget vs the 16 default: verification
#    scratch ~ edges x ~100 retained shingles x 24 B raw, and the box
#    has ~49 GB free — if the 500k lane's log shows comfortable
#    headroom this can be re-run at 16.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 SCALING_NGRAM_STAR=8 \
  timeout 10800 python scripts/scaling_study.py >logs/r11_5m_ngclust.log 2>&1

# 7. minhash_clusters @5M (verdict item 2) — longest lane last; a
#    timeout is recorded honestly as the round's stopping point.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 12600 python scripts/scaling_study.py >logs/r11_5m_mhclust.log 2>&1

echo "R11 MEASUREMENT PIPELINE DONE"
