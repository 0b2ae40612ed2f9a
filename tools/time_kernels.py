"""A/B timing: delta vs recon embed kernel + rows sweep (1080p x 96 planes)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import time
import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import wm_pallas


def timed(name, fn, args, iters=4):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.mean(leaf.astype(jnp.float32))
        return acc
    try:
        acc = step(jnp.float32(0.0), *args)
        float(acc)
    except Exception as e:
        print(f"{name:55s} FAILED: {str(e)[:120]}", flush=True)
        return None
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:55s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    hp, wp, p = 1080, 1920, 96
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((p, hp, wp)).astype(np.float32) * 40 + 128)
    n = (hp // 8) * (wp // 8)
    mask = (np.arange(8) < 4).astype(np.float32)
    sws = jnp.asarray((rng.standard_normal((3, n, 8)) * mask)
                      .astype(np.float32))

    for sweeps in (5, 4, 3):
        timed(f"embed recon sweeps={sweeps}",
              lambda pl, s, sw=sweeps: wm_pallas.embed_plane_blocks.__wrapped__(
                  pl, s, sweeps=sw, variant="recon"), (planes, sws))
        timed(f"embed delta k=4 sweeps={sweeps}",
              lambda pl, s, sw=sweeps: wm_pallas.embed_plane_blocks.__wrapped__(
                  pl, s, sweeps=sw, k=4, variant="delta"), (planes, sws))

    print("-- rows sweep (sweeps=5) --", flush=True)
    for rows in (3, 5, 9, 15, 27):
        timed(f"embed delta rows={rows}",
              lambda pl, s, r=rows: wm_pallas.embed_plane_blocks.__wrapped__(
                  pl, s, k=4, rows=r, variant="delta"), (planes, sws))
        timed(f"spectrum rows={rows}",
              lambda pl, r=rows: wm_pallas.spectrum_plane_blocks.__wrapped__(
                  pl, rows=r), (planes,))


if __name__ == "__main__":
    main()
