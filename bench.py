"""Headline benchmark: 1080p color embed+extract frames/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference's measured single-core 1080p color numbers
(BASELINE.md, measured in the survey session): embed 33.3 s + extract
20.2 s per frame -> 0.0187 fps. Our number is the blocked-path (8x8 DCT +
batched Jacobi SVD) embed+extract on the same 1080p color frames, batched
to amortize the per-dispatch tunnel latency, steady-state timed.

Run with --config to exercise the other BASELINE.json configs
(512-gray, detect1k, video, robustness4k) — those print their own line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_1080P_EMBED_S = 33.3
REF_1080P_EXTRACT_S = 20.2
REF_BASELINE_FPS = 1.0 / (REF_1080P_EMBED_S + REF_1080P_EXTRACT_S)
REF_512_GRAY_S = 2.19 + 0.41        # embed + extract, BASELINE.md
REF_DETECT_1080P_S = 5.4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _inputs(batch, h, w, seed=0):
    import jax.numpy as jnp
    from dctsvd_tpu.utils import crypto
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), np.uint8))
    wm = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    key = crypto.derive_key("bench", bytes(range(8)))
    idx = jnp.asarray(crypto.permutation_indices(key, h * w))
    inv = jnp.asarray(crypto.inverse_permutation(np.asarray(idx)))
    return frames, wm, idx, inv


def bench_embed_extract(h=1080, w=1920, batch=4, iters=8, color=True):
    import jax
    import jax.numpy as jnp
    from dctsvd_tpu.models import blocked
    from dctsvd_tpu.ops import color as c_ops

    frames, wm, idx, inv = _inputs(batch, h, w)
    alpha = jnp.float32(0.12)

    if color:
        embed = blocked.embed_color
        extract = blocked.extract_color
        wm_in = wm
    else:
        embed = blocked.embed_gray
        extract = blocked.extract_gray
        wm_in = c_ops.bgr_to_gray(wm)

    def step(frames):
        r = embed(frames, wm_in, idx, alpha)
        rec = extract(r.stego_bgr, r.sc, r.uw, r.vwt, inv, alpha)
        return r.stego_bgr, rec

    # warmup/compile
    log(f"compiling embed+extract {h}x{w} batch={batch} color={color} ...")
    t0 = time.time()
    out = jax.block_until_ready(step(frames))
    log(f"compile+first: {time.time() - t0:.1f}s")

    t0 = time.time()
    for _ in range(iters):
        out = step(frames)
    jax.block_until_ready(out)
    dt = time.time() - t0
    fps = batch * iters / dt
    log(f"steady-state: {dt:.3f}s for {batch * iters} frames")
    return fps


def bench_detect(h=1080, w=1920, batch=16, iters=8):
    import jax
    import jax.numpy as jnp
    from dctsvd_tpu.models import blocked

    frames, wm, idx, _ = _inputs(batch, h, w)
    alpha = jnp.float32(0.12)
    r = blocked.embed_gray(frames, wm[..., 0], idx, alpha)
    stego, sc, sw = r.stego_bgr, r.sc, r.sw
    jax.block_until_ready(blocked.detect_gray(stego, sc, sw, alpha))
    t0 = time.time()
    for _ in range(iters):
        out = blocked.detect_gray(stego, sc, sw, alpha)
    jax.block_until_ready(out)
    return batch * iters / (time.time() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="1080p",
                   choices=["1080p", "512gray", "detect"])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    if args.config == "1080p":
        fps = bench_embed_extract(1080, 1920, args.batch, args.iters,
                                  color=True)
        print(json.dumps({
            "metric": "1080p color embed+extract throughput (blocked path)",
            "value": round(fps, 2), "unit": "frames/sec/chip",
            "vs_baseline": round(fps / REF_BASELINE_FPS, 1)}))
    elif args.config == "512gray":
        fps = bench_embed_extract(512, 512, args.batch * 4, args.iters,
                                  color=False)
        print(json.dumps({
            "metric": "512x512 gray embed+extract throughput (blocked path)",
            "value": round(fps, 2), "unit": "frames/sec/chip",
            "vs_baseline": round(fps * REF_512_GRAY_S, 1)}))
    else:
        fps = bench_detect(1080, 1920, args.batch * 4, args.iters)
        print(json.dumps({
            "metric": "1080p detect throughput (blocked path)",
            "value": round(fps, 2), "unit": "images/sec/chip",
            "vs_baseline": round(fps * REF_DETECT_1080P_S, 1)}))


if __name__ == "__main__":
    main()
