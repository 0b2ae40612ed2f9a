"""Round-3 decomposition: where do the serving kernels' milliseconds live?

Times spectrum/embed at sweeps 0..4 (sweeps is static -> separate
compiles): the sweeps=0 run is the kernel's FIXED cost (view transposes,
DMA, norms, sort, u-normalize, delta paint for embed) and the marginal
per-sweep slope is the pure Jacobi rotation cost. 96 planes of 1080p
(batch 32 color), rows=3, the serving config.
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
    chans = jnp.asarray(
        rng.standard_normal((batch, 3, h, w)).astype(np.float32) * 40 + 128)
    jax.block_until_ready(chans)
    n = (h // 8) * (w // 8)
    sws = jnp.asarray((rng.random((3, n, 8)) * 4).astype(np.float32))

    # the raw view transpose passes, for reference
    @jax.jit
    def view_only(chans):
        v, lead, hb, wb = wm_pallas._plane_cols_view(chans)
        return v[..., 0, 0, 0]

    timed("plane_cols_view alone (in-transpose)", view_only, (chans,))

    for sweeps in (0, 1, 2, 3, 4):
        def spec(chans, sweeps=sweeps):
            return wm_pallas.spectrum_plane_blocks.__wrapped__(
                chans, rows=3, sweeps=sweeps)
        timed(f"spectrum rows=3 sweeps={sweeps}", spec, (chans,))

    for sweeps in (0, 1, 2, 3):
        def emb(chans, sws, sweeps=sweeps):
            return wm_pallas.embed_plane_blocks.__wrapped__(
                chans, sws, k=4, rows=3, sweeps=sweeps, out_u8=True)
        timed(f"embed k4 u8 rows=3 sweeps={sweeps}", emb, (chans, sws))


if __name__ == "__main__":
    sys.exit(main())
