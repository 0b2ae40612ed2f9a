#!/bin/bash
# Round-4 hardware measurement pass (VERDICT r3 #1/#2): run the moment the
# TPU attachment answers. One command, logs under /tmp/r4_measure_<ts>/.
#
#   1. Full bench sweep (all configs incl. new detect-roc/8k-plane/
#      video-full) -> the BENCH_r04 story.
#   2. Extract-tail formulation A/B (exp_tail.py) — if recompute-fused
#      wins on TPU like it does on CPU (2x), flip the production tail.
#   3. In-kernel relayout retry (exp_relayout.py) — crashed the remote
#      Mosaic compiler last round; re-probe on the current toolchain.
#   4. Fixed-cost breakdown (profile_parts.py) for the per-pass ledger.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
TS=$(date +%s)
OUT=${1:-/tmp/r4_measure_$TS}
mkdir -p "$OUT"
echo "logs -> $OUT"

echo "=== 1. bench sweep"
bash tools/run_all_benches.sh "$OUT/benches"

echo "=== 2. extract-tail A/B"
timeout 1200 python tools/exp_tail.py 2>&1 | tee "$OUT/exp_tail.log"

echo "=== 3. in-kernel relayout retry"
timeout 1200 python tools/exp_relayout.py 2>&1 | tee "$OUT/exp_relayout.log"

echo "=== 4. fixed-cost breakdown"
timeout 1200 python tools/profile_parts.py 2>&1 | tee "$OUT/profile_parts.log"

echo "=== done; key lines:"
grep -h . "$OUT/benches"/*.json 2>/dev/null
