"""Stage-by-stage TPU timing of the blocked pipeline (1080p color, batch 32).

Methodology: block_until_ready doesn't block on the axon tunnel, so each
stage is chained through a device-side scalar accumulator and synced ONCE
via a host readback (see bench.py).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.models import blocked
from dctsvd_tpu.ops import color as c_ops
from dctsvd_tpu.ops import wm_pallas, dct, svd
from dctsvd_tpu.utils import crypto


def timed(name, fn, args, iters=8):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        for leaf in leaves:
            acc = acc + jnp.sum(leaf.astype(jnp.float32) * 0) + \
                jnp.mean(leaf.astype(jnp.float32))
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
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), np.uint8))
    wm = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    key = crypto.derive_key("bench", bytes(range(8)))
    blk, intra = crypto.block_permutation_indices(
        key, blocked.n_blocks_of(h, w))
    blk, intra = jnp.asarray(blk), jnp.asarray(intra)
    alpha = jnp.float32(0.12)
    pw = blocked.prepare_wm_color(wm, blk, intra)
    jax.block_until_ready(pw)

    hp, wp = h + (-h) % 8, w + (-w) % 8
    planes = jnp.asarray(
        rng.standard_normal((batch, 3, hp, wp)).astype(np.float32) * 40 + 128)
    n = (hp // 8) * (wp // 8)
    sws = jnp.asarray(rng.standard_normal((3, n, 8)).astype(np.float32))
    print(f"planes {planes.shape}, {batch * 3 * n} blocks total", flush=True)

    # whole embed+extract step (the bench number, for reference)
    def full_step(frames, sw, uw, vwt, iblk, iintra):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        rec = blocked.extract_color.__wrapped__(
            stego, sc, uw, vwt, iblk, iintra, alpha)
        return stego, rec, sc

    t_full = timed("full embed+extract step", full_step,
                   (frames, pw.sw, pw.uw, pw.vwt, pw.inv_blk, pw.inv_intra),
                   iters=4)
    print(f"  -> {batch / (t_full / 1000):8.1f} fps", flush=True)

    # embed only
    def embed_only(frames, sw):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        return stego, sc
    timed("embed_color_prepared (u8 in/out + glue)", embed_only,
          (frames, pw.sw), iters=4)

    # fused embed kernel on ready-made f32 planes
    sws_scaled = (alpha * pw.sw).astype(jnp.float32)
    timed("embed_plane_blocks kernel (f32 planes)",
          lambda p, s: wm_pallas.embed_plane_blocks.__wrapped__(p, s),
          (planes.reshape(batch * 3, hp, wp), sws_scaled), iters=4)

    # spectrum kernel on f32 planes
    timed("spectrum_plane_blocks kernel (f32 planes)",
          lambda p: wm_pallas.spectrum_plane_blocks.__wrapped__(p),
          (planes.reshape(batch * 3, hp, wp),), iters=4)

    # extract (spectrum + tail)
    stego, sc, _, _ = blocked.embed_color_prepared(
        frames, pw.sw, alpha, with_metrics=False)
    jax.block_until_ready((stego, sc))
    timed("extract_color (spectrum + tail + glue)",
          lambda *a: blocked.extract_color.__wrapped__(*a, alpha),
          (stego, sc, pw.uw, pw.vwt, pw.inv_blk, pw.inv_intra), iters=4)

    # extract tail only: recon einsum + permuted IDCT + normalize
    s_cw = sc + 0.1  # stand-in spectrum, right shape [B, 3, N, 8]
    def tail(s_cw, sc, uw, vwt, iblk, iintra):
        mask = jnp.arange(8) < 4
        sw_hat = jnp.where(mask, (s_cw - sc) / alpha, 0.0)
        sw_nat = jnp.take(sw_hat, iblk, axis=-2)
        wm_blocks = jnp.einsum("...nij,...nj,...njk->...nik", uw, sw_nat,
                               vwt, precision=jax.lax.Precision.HIGHEST)
        wy = dct.idct2_blocks_to_plane(wm_blocks, hp, wp,
                                       row_perm=iintra)
        lo = jnp.min(wy, axis=(-2, -1), keepdims=True)
        hi = jnp.max(wy, axis=(-2, -1), keepdims=True)
        return (wy - lo) * (255.0 / jnp.maximum(hi - lo, 1e-12))
    timed("extract tail (recon+IDCT+normalize)", tail,
          (s_cw, sc, pw.uw, pw.vwt, pw.inv_blk, pw.inv_intra), iters=4)

    # glue: u8 -> channel planes f32 and back
    timed("glue: u8 HWC -> f32 CHW planes",
          lambda f: jnp.moveaxis(f.astype(jnp.float32), -1, -3),
          (frames,), iters=8)
    timed("glue: clip+cast+moveaxis back",
          lambda p: jnp.moveaxis(jnp.clip(p, 0, 255), -3, -1
                                 ).astype(jnp.uint8),
          (planes,), iters=8)

    # kernel sweep-count scaling
    for sweeps in (3, 4, 5):
        timed(f"embed kernel sweeps={sweeps}",
              lambda p, s, sw=sweeps: wm_pallas.embed_plane_blocks.__wrapped__(
                  p, s, sweeps=sw),
              (planes.reshape(batch * 3, hp, wp), sws_scaled), iters=4)
        timed(f"spectrum kernel sweeps={sweeps}",
              lambda p, sw=sweeps: wm_pallas.spectrum_plane_blocks.__wrapped__(
                  p, sweeps=sw),
              (planes.reshape(batch * 3, hp, wp),), iters=4)


if __name__ == "__main__":
    main()
