#!/bin/bash
# Round-5 fractional-tier measurement (VERDICT r4 #1): now that fractional
# Jacobi schedules ride the whole stack (env parse -> kernels -> meta
# (sweeps, sweeps_xpairs) -> digest v3 -> cross-backend replay), measure
# the tier curve on the real chip and pick the fastest tier that matches
# the s2 quality floor.
#
#   1. fps curve: 1080p color embed+extract + serve+verify + serve+score
#      at s0.75 / s1 / s1.25 / s1.5 / s1.75 / s2 (one process per tier —
#      DCTSVD_FUSED_SWEEPS is read once at import).
#   2. quality curve: the full 4K robustness sweep (detect + extract NC /
#      SSIM under JPEG q50, noise s5, crop25, resize50, alpha 0.10-0.22)
#      for each candidate tier.
#   3. detect-roc for the promotion candidate.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
TS=$(date +%s)
OUT=${1:-/tmp/r5_tiers_$TS}
mkdir -p "$OUT"
echo "logs -> $OUT"

TIERS=${TIERS:-"0.75 1 1.25 1.5 1.75 2"}

echo "=== 1. fps curve"
for t in $TIERS; do
  echo "--- tier s$t"
  DCTSVD_FUSED_SWEEPS=$t timeout 900 python bench.py --config 1080p \
    --iters 4 2>&1 | tee "$OUT/fps_s$t.log"
done

echo "=== 2. 4K robustness per tier"
for t in ${ROBUST_TIERS:-$TIERS}; do
  echo "--- tier s$t"
  DCTSVD_FUSED_SWEEPS=$t timeout 1800 python bench.py \
    --config robustness 2>&1 | tee "$OUT/robust_s$t.log"
done

echo "=== 3. summary"
for t in $TIERS; do
  fps=$(grep -o '"value": [0-9.]*' "$OUT/fps_s$t.log" | head -1)
  score=$(grep -ho 'serve+score rep1.*' "$OUT/fps_s$t.log" | head -1)
  worst=$(grep -o '"value": [0-9.]*' "$OUT/robust_s$t.log" 2>/dev/null | head -1)
  echo "s$t: embed+extract $fps | $score | robustness-min $worst"
done
