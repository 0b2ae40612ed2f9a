"""Round-3 A/B: u8 view transposes + raw-g delta paint.

Measures the serving kernels on u8 inputs (view transpose stays u8, widen
in VMEM — 199 vs 796 MB per 96-plane pass) and the raw-g embed paint
(1/s folded into the coefficient, U normalization divides deleted),
against the r2 shipped numbers (f32 view): spectrum s3 38.5 ms,
embed s3 49.3 ms at 96×1080p planes.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import wm_pallas


def timed(name, fn, args, iters=8):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc

    acc = step(jnp.float32(0.0), *args)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:45s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    h, w, batch = 1080, 1920, 32
    rng = np.random.default_rng(0)
    chans_u8 = jnp.asarray(rng.integers(0, 256, (batch, 3, h, w), np.uint8))
    chans_f32 = chans_u8.astype(jnp.float32)
    jax.block_until_ready((chans_u8, chans_f32))
    n = (h // 8) * (w // 8)
    sws = jnp.asarray((rng.random((3, n, 8)) * 4).astype(np.float32))

    # correctness: u8 input == f32 input
    small8 = chans_u8[:1, :1, :24, :64]
    small32 = chans_f32[:1, :1, :24, :64]
    s8 = wm_pallas.spectrum_plane_blocks.__wrapped__(small8, sweeps=3, rows=3)
    s32 = wm_pallas.spectrum_plane_blocks.__wrapped__(small32, sweeps=3,
                                                      rows=3)
    print(f"spectrum u8-vs-f32 max err: "
          f"{float(jnp.max(jnp.abs(s8 - s32))):.3e}", flush=True)
    ssw = sws[:1, :n // 1, :]
    m8, sc8 = wm_pallas.embed_plane_blocks.__wrapped__(
        small8, sws[:1, :24, :] * 0 + 1.0, k=4, sweeps=3, out_u8=True)
    m32, sc32 = wm_pallas.embed_plane_blocks.__wrapped__(
        small32, sws[:1, :24, :] * 0 + 1.0, k=4, sweeps=3, out_u8=True)
    print(f"embed u8-vs-f32 marked max err: "
          f"{float(jnp.max(jnp.abs(m8.astype(jnp.int32) - m32.astype(jnp.int32))))}"
          f"  sc err {float(jnp.max(jnp.abs(sc8 - sc32))):.3e}", flush=True)

    for sweeps in (2, 3):
        timed(f"spectrum u8-view s{sweeps}",
              lambda x, s=sweeps: wm_pallas.spectrum_plane_blocks.__wrapped__(
                  x, sweeps=s), (chans_u8,))
    for sweeps in (2, 3):
        timed(f"embed u8-view rawg s{sweeps} k4 u8out",
              lambda x, sw, s=sweeps: wm_pallas.embed_plane_blocks.__wrapped__(
                  x, sw, k=4, sweeps=s, out_u8=True), (chans_u8, sws))
    # f32 input path unchanged?
    timed("spectrum f32-view s3",
          lambda x: wm_pallas.spectrum_plane_blocks.__wrapped__(x, sweeps=3),
          (chans_f32,))


if __name__ == "__main__":
    sys.exit(main())
