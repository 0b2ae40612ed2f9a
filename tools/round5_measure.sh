#!/bin/bash
# Round-5 final measurement pass (VERDICT r4 items), run AFTER the tier
# study (tools/round5_tiers.sh) promoted s1.25 to the serving default.
# One real v5e chip — runs serialize. Each config is one process so the
# import-time tier env / compile caches stay clean.
#
#   roc        detect-roc at the promoted tier: synthetic + the new
#              natural-statistics corpus (VERDICT #4) — the promotion gate
#   geometric  shift/rotation battery + translation-resync recovery (#2)
#   budget     per-pass budget + zero-sweep fixed-cost ceiling (#1 proof)
#   video      e2e fps + the new device-step/codec split metric (#3)
#   full8      parity path at batch 8 (#6 — batching svd_full)
#   ablate     estimator hardening passes itemized (#5): fps with each
#              round-4 pass reverted, vs the promoted default
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
OUT=${1:-/tmp/r5_measure}
mkdir -p "$OUT"
echo "logs -> $OUT"
ONLY=${ONLY:-"roc geometric budget video full8 ablate"}

for step in $ONLY; do
  echo "=== $step $(date +%H:%M:%S)"
  case $step in
    roc)
      timeout 2400 python bench.py --config detect-roc \
        2>&1 | tee "$OUT/roc.log" ;;
    geometric)
      timeout 2400 python bench.py --config geometric \
        2>&1 | tee "$OUT/geometric.log" ;;
    budget)
      timeout 1800 python bench.py --config budget --iters 8 \
        2>&1 | tee "$OUT/budget.log" ;;
    video)
      timeout 1800 python bench.py --config video \
        2>&1 | tee "$OUT/video.log" ;;
    full8)
      timeout 2400 python bench.py --config 1080p-full --full-batch 8 \
        2>&1 | tee "$OUT/full8.log" ;;
    ablate)
      for sw in compweights negprior quantgate rectify; do
        DCTSVD_ESTIMATOR_ABLATE=$sw timeout 1200 python bench.py \
          --config 1080p --iters 4 2>&1 | tee "$OUT/ablate_$sw.log"
      done ;;
  esac
done
echo "=== done $(date +%H:%M:%S)"
