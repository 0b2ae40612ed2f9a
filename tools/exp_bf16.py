"""Round-3 hardware A/B: bf16 sweep-column storage + fixed out_u8 cast.

bf16 halves the register bytes of the spill-limited sweep body
(VERDICT r2 #1b); if pressure really is the bound, larger row tiles may
come back into play — hence the rows=9 bf16 point. Baselines from
tools/exp_rows1 (same shapes, same chip): spectrum s3 f32 rows=3 38.6 ms,
rows=1 46.2, rows=5 40.3. 1080p color scale (batch 32 -> 96 planes),
serving sweeps=3. Remote pallas compiles are ~4-5 min each and bypass the
persistent cache, so only decisive variants run.
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

    acc = jnp.float32(0.0)
    acc = step(acc, *args)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:48s} {dt:8.2f} ms/iter", flush=True)
    return dt


def main():
    h, w, batch = 1080, 1920, 32
    rng = np.random.default_rng(0)
    chans = jnp.asarray(
        rng.standard_normal((batch, 3, h, w)).astype(np.float32) * 40 + 128)
    jax.block_until_ready(chans)
    n = (h // 8) * (w // 8)
    sws = jnp.asarray((rng.random((3, n, 8)) * 4).astype(np.float32))

    for bf16, rows in ((True, 3), (True, 9)):
        def spec(chans, rows=rows, bf16=bf16):
            return wm_pallas.spectrum_plane_blocks.__wrapped__(
                chans, rows=rows, sweeps=3, bf16=bf16)
        timed(f"spectrum s3 bf16={int(bf16)} rows={rows}", spec, (chans,))

    for bf16, out_u8 in ((False, False), (True, False), (True, True)):
        def emb(chans, sws, bf16=bf16, out_u8=out_u8):
            return wm_pallas.embed_plane_blocks.__wrapped__(
                chans, sws, k=4, rows=3, sweeps=3,
                out_u8=out_u8, bf16=bf16)
        timed(f"embed s3 k4 bf16={int(bf16)} u8={int(out_u8)} rows=3",
              emb, (chans, sws))


if __name__ == "__main__":
    sys.exit(main())
