#!/bin/bash
# Round-5 second measurement pass, after the rotation-resync landing:
#   geometric  4K shift/rotation battery with the NEW counter-rotation
#              search rows (white-noise worst case + _nat recovery rows)
#   tiers      the s1.5 / s1.75 4K robustness rows that round 5's first
#              pass skipped (bracketing gap, STATUS "honest gaps" #2)
#   relayout   Mosaic in-kernel relayout re-probe (VERDICT r4 #8; three
#              failure signatures recorded in tools/exp_relayout.py)
# One real v5e chip - runs serialize, one process per step.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
OUT=${1:-/tmp/r5b_measure}
mkdir -p "$OUT"
echo "logs -> $OUT"
ONLY=${ONLY:-"geometric tier1.5 tier1.75 relayout"}

for step in $ONLY; do
  echo "=== $step $(date +%H:%M:%S)"
  case $step in
    geometric)
      timeout 3000 python bench.py --config geometric \
        2>&1 | tee "$OUT/geometric.log" ;;
    tier1.5)
      DCTSVD_FUSED_SWEEPS=1.5 timeout 1800 python bench.py \
        --config robustness 2>&1 | tee "$OUT/robust_s1.5.log" ;;
    tier1.75)
      DCTSVD_FUSED_SWEEPS=1.75 timeout 1800 python bench.py \
        --config robustness 2>&1 | tee "$OUT/robust_s1.75.log" ;;
    relayout)
      timeout 1200 python tools/exp_relayout.py \
        2>&1 | tee "$OUT/relayout.log" ;;
  esac
done
echo "=== done $(date +%H:%M:%S)"
