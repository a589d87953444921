#!/bin/bash
# Round-10 measurement pipeline (requires an uncontended box — timings
# feed SCALE.md's measured table). Each lane is its own process so an
# OOM/timeout loses only that lane. Logs under logs/.
#
# Hygiene (memory: measurement-hygiene): warm-up lane first and
# untabled; same-round anchors for every op pushed to 5M; nothing else
# may run during a lane; check `df -h /` headroom before the 5M
# pair-materializing lanes.
cd /root/repo || exit 1
mkdir -p logs
set -x

# 0. Warm-up (cold-box absorber; NEVER tabled).
SPARK_DRIVER_MEM=16g SCALING_DOC_SIZES=50000 SCALING_ONLY=dedup_exact \
  timeout 1800 python scripts/scaling_study.py >logs/r10_warmup.log 2>&1

# 1-2. Same-round anchors for the ops measured at 5M this round.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=50000 \
  SCALING_ONLY=winnow_clusters,ngram_jaccard,minhash_lsh \
  timeout 3600 python scripts/scaling_study.py >logs/r10_anchor_50k.log 2>&1
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 \
  SCALING_ONLY=winnow_clusters,ngram_jaccard,minhash_lsh \
  timeout 7200 python scripts/scaling_study.py >logs/r10_anchor_500k.log 2>&1

# 3. ngram@5M re-run under the three-band policy WITH corpus-scaled
#    shuffle partitions (verdict item 2; the r9 abort was a pinned
#    hash build at fixed 32 partitions).
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_jaccard \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 9000 python scripts/scaling_study.py >logs/r10_5m_ngram.log 2>&1

# 4. winnow_clusters@5M — the round's contract headline (verdict item
#    1): the decade where the pair contract DNF'd on ~240 GB of
#    candidate-pair shuffle.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=winnow_clusters \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 9000 python scripts/scaling_study.py >logs/r10_5m_winclust.log 2>&1

# 5. HierarchicalIVF at the reference's own 384-d with coarse_dim
#    (verdict item 3): occupancy must hold <=4x mean at 500k.
SPARK_DRIVER_MEM=64g SCALING_DIM=384 SCALING_VEC_SIZES=500000 \
  SCALING_ONLY=hier_build,hier_search \
  timeout 7200 python scripts/scaling_study.py >logs/r10_hier384.log 2>&1

# 6. 384-d partial-probe recall ladder on a planted-cluster corpus
#    (verdict item 4).
SPARK_DRIVER_MEM=64g timeout 5400 \
  python scripts/recall_ladder_384.py >logs/r10_recall384.log 2>&1

# 7. minhash@5M (verdict item 2, "immediately behind") — longest lane
#    last; a timeout here is recorded honestly as the round's stopping
#    point, not silently retried.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_lsh \
  SCALING_SHUFFLE_PARTITIONS=256 \
  timeout 10800 python scripts/scaling_study.py >logs/r10_5m_minhash.log 2>&1

echo "R10 MEASUREMENT PIPELINE DONE"
