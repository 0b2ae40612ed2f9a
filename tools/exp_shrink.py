"""A/B harness for the extraction estimator (VERDICT r3 #6).

Measures extraction quality (NC vs the embedded watermark, plus detect
score) under clean/JPEG-q50/noise-σ5/25%-crop at the default alpha grid,
through the PUBLIC blocked extract path — run it once on the baseline
estimator and once on the candidate to A/B (the estimator lives in
models/blocked.py; this tool has no switch of its own, it measures
whatever the library does).

Usage: [JAX_PLATFORMS via jax.config] python tools/exp_shrink.py [h w]
Prints one JSON line per (alpha, attack) plus a summary row.
"""

import json
import sys

import numpy as np


def main(h=512, w=512, alphas=(0.10, 0.13, 0.16, 0.19, 0.22)):
    import cv2
    import jax.numpy as jnp
    from dctsvd_tpu.models import blocked
    from dctsvd_tpu.utils import crypto

    rng = np.random.default_rng(11)
    cover = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8),
        (0, 0), 3)
    # structured watermark (text-like shapes): NC against it measures
    # legibility-style recovery, not noise-matching
    wm = np.zeros((h, w), np.uint8)
    cv2.putText(wm, "WM", (w // 8, 2 * h // 3), cv2.FONT_HERSHEY_SIMPLEX,
                h / 80.0, 255, max(2, h // 40))
    cv2.circle(wm, (3 * w // 4, h // 4), h // 8, 255, -1)

    key = crypto.derive_key("shrink", bytes(range(8)))
    blk, intra = crypto.block_permutation_indices(
        key, blocked.n_blocks_of(h, w))
    blk, intra = jnp.asarray(blk), jnp.asarray(intra)
    pw = blocked.prepare_wm_gray(jnp.asarray(wm), blk, intra)

    def nc(a, b):
        a = a.astype(np.float32).ravel() - a.mean()
        b = b.astype(np.float32).ravel() - b.mean()
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))

    worst = {}
    for a in alphas:
        alpha = jnp.float32(a)
        stego, sc, _, _ = blocked.embed_gray_prepared(
            jnp.asarray(cover)[None], pw.sw, alpha, with_metrics=False)
        s_np = np.asarray(stego)[0]
        jpeg = cv2.imdecode(cv2.imencode(
            ".jpg", s_np, [cv2.IMWRITE_JPEG_QUALITY, 50])[1],
            cv2.IMREAD_COLOR)
        noisy = np.clip(s_np.astype(np.float32)
                        + rng.normal(0, 5, s_np.shape), 0, 255
                        ).astype(np.uint8)
        crop = s_np.copy()
        crop[: h // 4] = 0
        for name, img in (("clean", s_np), ("jpeg_q50", jpeg),
                          ("noise_s5", noisy), ("crop25", crop)):
            img_d = jnp.asarray(img)[None]
            rec = np.asarray(blocked.extract_gray_prepared(
                img_d, sc, pw.ebasis, pw.inv_blk, alpha, sw=pw.sw))[0]
            det = float(blocked.detect_gray(img_d, sc, pw.sw, alpha)[0])
            v = nc(rec, wm)
            row = {"alpha": a, "attack": name, "extract_nc": round(v, 4),
                   "detect": round(det, 4)}
            print(json.dumps(row), flush=True)
            worst[name] = min(worst.get(name, 1.0), v)
    print(json.dumps({"summary_worst_extract_nc":
                      {k: round(v, 4) for k, v in worst.items()}}))


if __name__ == "__main__":
    import jax
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    args = [int(x) for x in sys.argv[1:] if x.isdigit()]
    main(*args)
