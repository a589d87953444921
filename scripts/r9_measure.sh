#!/bin/bash
# Round-9 measurement pipeline (requires an uncontended box — timings
# feed SCALE.md's measured table). Each lane is its own process so an
# OOM/timeout loses only that lane. Logs under logs/.
cd /root/repo || exit 1
mkdir -p logs
set -x

# 1. ANN serving path one more decade: 5M x 64-d (verdict item 6a).
SPARK_DRIVER_MEM=64g SCALING_VEC_SIZES=500000,5000000 \
  SCALING_ONLY=ivf_build,ivf_search_persisted \
  timeout 5400 python scripts/scaling_study.py >logs/r9_ivf5m.log 2>&1

# 2. ANN at the reference's own dimension: 500k x 384-d (item 6b).
SPARK_DRIVER_MEM=64g SCALING_DIM=384 SCALING_VEC_SIZES=500000 \
  SCALING_ONLY=ivf_build,ivf_search_persisted \
  timeout 5400 python scripts/scaling_study.py >logs/r9_ivf384.log 2>&1

# 3. Re-measure the text lanes at 500k with the round-9 candidate cuts
#    (PPJoin length+positional filters, winnow per-doc cap) — the
#    fresh 500k points anchor the 500k->5M exponents — plus the new
#    clique-mode simhash at the size pair mode cannot run.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=500000 \
  SCALING_ONLY=simhash_clusters,winnow_pairs,ngram_jaccard,minhash_lsh \
  timeout 7200 python scripts/scaling_study.py >logs/r9_500k.log 2>&1

# 4-7. The 5M-doc decade, one lane per process, cheapest first
#    (verdict item 1). Corpus generation is staged+reused via _SUCCESS.
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=winnow_pairs \
  timeout 7200 python scripts/scaling_study.py >logs/r9_5m_winnow.log 2>&1
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=simhash_clusters \
  timeout 7200 python scripts/scaling_study.py >logs/r9_5m_simclust.log 2>&1
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=ngram_jaccard \
  timeout 9000 python scripts/scaling_study.py >logs/r9_5m_ngram.log 2>&1
SPARK_DRIVER_MEM=80g SCALING_DOC_SIZES=5000000 SCALING_ONLY=minhash_lsh \
  timeout 9000 python scripts/scaling_study.py >logs/r9_5m_minhash.log 2>&1

echo "R9 MEASUREMENT PIPELINE DONE"
