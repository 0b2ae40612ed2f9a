#!/bin/bash
# Run every bench config sequentially on the real chip and collect the
# JSON lines + stderr logs under /tmp/benches_<ts>/ — the round-end
# measurement pass in one command. Skips nothing; order puts the fast
# headline configs first so a mid-run outage still yields the key rows.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%s)
OUT=${1:-/tmp/benches_$TS}
mkdir -p "$OUT"
echo "logs -> $OUT"
run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout 1800 "$@" >"$OUT/$name.json" 2>"$OUT/$name.log"
  rc=$?
  tail -1 "$OUT/$name.json" 2>/dev/null
  [ $rc -ne 0 ] && echo "  rc=$rc (see $OUT/$name.log)"
}
run 1080p      python bench.py --config 1080p
run 1080p_s1   env DCTSVD_FUSED_SWEEPS=1 python bench.py --config 1080p
run 1080pgray  python bench.py --config 1080pgray
run 512gray    python bench.py --config 512gray
run detect     python bench.py --config detect
run 4k         python bench.py --config 4k
run mesh       python bench.py --config mesh
run full       python bench.py --config 1080p-full
run 8k_plane   python bench.py --config 8k-plane
run detect_roc python bench.py --config detect-roc
run video      python bench.py --config video
run video_full python bench.py --config video --scheme full
run robustness python bench.py --config robustness
echo "=== all JSON lines:"
grep -h . "$OUT"/*.json 2>/dev/null
