"""Fixed-cost breakdown: XLA view transposes, luma, unblockify, normalize,
and kernel row-tile (R) sweep at 1080p."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import color as c_ops
from dctsvd_tpu.ops import dct, wm_pallas


def timed(name, fn, *args, iters=12):
    acc = jnp.float32(0.0)
    acc2 = fn(*args, acc)
    _ = float(acc2)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc)
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    h, w, batch = 1080, 1920, 32
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), np.uint8))
    chans = jnp.moveaxis(frames.astype(jnp.float32), -1, -3)  # [B,3,H,W]
    jax.block_until_ready(chans)
    n = (h // 8) * (w // 8)
    sws = jnp.asarray(rng.random((3, n, 8), np.float32))
    blocks = jnp.asarray(rng.standard_normal(
        (batch, 3, n, 8, 8)).astype(np.float32))

    @jax.jit
    def view_only(chans, acc):
        v, lead, hb, wb = wm_pallas._plane_cols_view(chans)
        return acc + jnp.sum(v[..., 0, 0, 0])

    @jax.jit
    def view_roundtrip(chans, acc):
        v, lead, hb, wb = wm_pallas._plane_cols_view(chans)
        back = jnp.swapaxes(v, 3, 4).reshape(*lead, hb * 8, wb * 8)
        return acc + jnp.mean(back)

    @jax.jit
    def luma(frames, acc):
        return acc + jnp.mean(c_ops.luma_f32(frames))

    @jax.jit
    def chans_cast(frames, acc):
        c = jnp.moveaxis(frames.astype(jnp.float32), -1, -3)
        return acc + jnp.mean(c)

    @jax.jit
    def unblockify(blocks, acc):
        p = dct.unblockify(blocks, h + 0, w + 0)
        return acc + jnp.mean(p)

    @jax.jit
    def normalize(chans, acc):
        lo = jnp.min(chans, axis=(-2, -1), keepdims=True)
        hi = jnp.max(chans, axis=(-2, -1), keepdims=True)
        wy = (chans - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))
        return acc + jnp.mean(wy)

    timed("plane_cols_view (in-transpose)", view_only, chans)
    timed("view roundtrip (in+out transpose)", view_roundtrip, chans)
    timed("luma_f32", luma, frames)
    timed("moveaxis+cast (color chans)", chans_cast, frames)
    timed("unblockify [N,8,8]->plane", unblockify, blocks)
    timed("normalize (min/max scale)", normalize, chans)

    for rows in (9, 15, 27, 45):
        if 135 % rows:
            continue

        @jax.jit
        def spec(chans, acc, rows=rows):
            s = wm_pallas.spectrum_plane_blocks.__wrapped__(chans, rows=rows)
            return acc + jnp.mean(s)
        timed(f"spectrum s4 rows={rows}", spec, chans)

    for rows in (9, 15, 27):
        @jax.jit
        def emb(chans, sws, acc, rows=rows):
            m, sc = wm_pallas.embed_plane_blocks.__wrapped__(
                chans, sws, k=4, rows=rows)
            return acc + jnp.mean(m) + jnp.mean(sc)
        timed(f"embed s4 k4 rows={rows}", emb, chans, sws)


if __name__ == "__main__":
    sys.exit(main())
