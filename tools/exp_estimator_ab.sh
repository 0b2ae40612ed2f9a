#!/bin/bash
# Estimator-hardening cost itemization (VERDICT r4 #5): the round-4
# robustness hardening (per-component Cauchy weights, negative->prior,
# quarter-order-statistic presence gate, non-negativity rectification)
# cost 2.5 % of serving throughput as one lump (517 -> 505.7 fps). This
# measures each pass's share in the COMPOSED 1080p serving graph by
# ablating them one at a time (DCTSVD_ESTIMATOR_ABLATE, trace-time
# switches in models/blocked._shrink_sw_hat; one process per point —
# the env is read at import).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
OUT=${1:-/tmp/r5_estimator_ab}
mkdir -p "$OUT"
echo "logs -> $OUT"

for ab in "" compweights negprior quantgate rectify \
          compweights,negprior,quantgate,rectify; do
  name=${ab:-none}; name=${name//,/+}
  echo "--- ablate: $name"
  DCTSVD_ESTIMATOR_ABLATE=$ab timeout 900 python bench.py --config 1080p \
    --iters 4 > "$OUT/ab_$name.log" 2>&1
  echo "rc=$?"
done

echo "=== summary (embed+extract fps per ablation)"
for f in "$OUT"/ab_*.log; do
  fps=$(grep -o '"value": [0-9.]*' "$f" | head -1)
  echo "$(basename "$f" .log): $fps"
done
