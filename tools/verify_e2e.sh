#!/bin/bash
# /verify recipe: drive the CLI end-to-end on the real TPU (both methods).
set -e
D=$(mktemp -d /tmp/dctsvd_verify_XXXX)
cd "$D"
export PYTHONPATH=/root/repo:/root/.axon_site
python - <<'EOF'
import numpy as np, cv2
rng = np.random.default_rng(0)
cv2.imwrite('host.png', cv2.GaussianBlur(rng.integers(0,256,(512,512,3),np.uint8).astype(np.uint8),(0,0),3))
wm = np.zeros((128,128,3), np.uint8); cv2.putText(wm,'WM',(10,90),cv2.FONT_HERSHEY_SIMPLEX,3,(255,255,255),8)
cv2.imwrite('wm.png', wm)
EOF
echo "== blocked method =="
python -m dctsvd_tpu.cli embed host.png wm.png --out sb.png --meta mb.npz --alpha 0.12 --password pw --method blocked
python -m dctsvd_tpu.cli extract sb.png mb.npz --out outb.png --password pw
python -m dctsvd_tpu.cli detect sb.png mb.npz
echo "== full (parity) method =="
python -m dctsvd_tpu.cli embed host.png wm.png --out s.png --meta m.npz --alpha 0.12 --password pw
python -m dctsvd_tpu.cli extract s.png m.npz --out out_wm.png --password pw
python -m dctsvd_tpu.cli detect s.png m.npz
echo "== wrong password must fail =="
if python -m dctsvd_tpu.cli extract s.png m.npz --out bad.png --password WRONG 2>/dev/null; then
  echo "ERROR: wrong password accepted"; exit 1
else
  echo "wrong password rejected (OK)"
fi
echo "VERIFY E2E OK: $D"
