"""Round-3 experiment: row-tile sweep INCLUDING rows=1 (never measured in
round 2 — _rows_per_cell picks the LARGEST divisor with R*Wb<=1024, so the
smallest tiles were untested) for both serving kernels at sweeps=3.
1080p color scale (batch 32 planes*3)."""
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

    acc = jnp.float32(0.0)
    acc = step(acc, *args)
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
    chans = jnp.asarray(
        rng.standard_normal((batch, 3, h, w)).astype(np.float32) * 40 + 128)
    jax.block_until_ready(chans)
    n = (h // 8) * (w // 8)
    sws = jnp.asarray((rng.random((3, n, 8)) * 4).astype(np.float32))

    for rows in (1, 3, 5):
        def spec(chans, rows=rows):
            return wm_pallas.spectrum_plane_blocks.__wrapped__(
                chans, rows=rows, sweeps=3)
        timed(f"spectrum s3 rows={rows}", spec, (chans,))

    for rows in (1, 3, 5):
        def emb(chans, sws, rows=rows):
            return wm_pallas.embed_plane_blocks.__wrapped__(
                chans, sws, k=4, rows=rows, sweeps=3, out_u8=True)
        timed(f"embed s3 k4 u8 rows={rows}", emb, (chans, sws))


if __name__ == "__main__":
    sys.exit(main())
