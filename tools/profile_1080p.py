"""Per-stage timing of the 1080p color embed+extract step on the real chip.

Chained-accumulator methodology (see bench.py): each timed region chains a
scalar dependency through every iteration and forces one readback at the end.
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
from dctsvd_tpu.ops import wm_pallas
from dctsvd_tpu.utils import crypto


def timed(name, fn, *args, iters=12):
    acc = jnp.float32(0.0)
    out = fn(*args, acc)          # compile + first
    _ = float(out[-1] if isinstance(out, tuple) else out)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        out = fn(*args, acc)
        acc = out[-1] if isinstance(out, tuple) else out
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:40s} {dt*1e3:8.2f} ms/iter", flush=True)
    return dt


def main():
    import os
    h, w, batch = 1080, 1920, int(os.environ.get("B", "32"))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), np.uint8))
    wm = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    key = crypto.derive_key("bench", bytes(range(8)))
    blk, intra = crypto.block_permutation_indices(
        key, blocked.n_blocks_of(h, w))
    pw = blocked.prepare_wm_color(wm, jnp.asarray(blk), jnp.asarray(intra))
    alpha = jnp.float32(0.12)

    # full step, embed only, extract only
    @jax.jit
    def full(frames, sw, ebasis, iblk, alpha, acc):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        rec = blocked.extract_color_prepared.__wrapped__(
            stego, sc, ebasis, iblk, alpha)
        return (acc + jnp.mean(rec.astype(jnp.float32))
                + jnp.mean(stego.astype(jnp.float32)) + jnp.mean(sc))

    @jax.jit
    def embed_only(frames, sw, alpha, acc):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        return (acc + jnp.mean(stego.astype(jnp.float32)) + jnp.mean(sc))

    stego0, sc0, _, _ = blocked.embed_color_prepared(
        frames, pw.sw, alpha, with_metrics=False)

    @jax.jit
    def extract_only(stego, sc, ebasis, iblk, alpha, acc):
        rec = blocked.extract_color_prepared.__wrapped__(
            stego, sc, ebasis, iblk, alpha)
        return acc + jnp.mean(rec.astype(jnp.float32))

    # raw kernels on pre-extracted planes
    chans = jnp.moveaxis(frames.astype(jnp.float32), -1, -3)  # [B,3,H,W]

    @jax.jit
    def embed_kernel_only(chans, sws, acc):
        marked, sc = wm_pallas.embed_plane_blocks.__wrapped__(chans, sws, k=4)
        return acc + jnp.mean(marked) + jnp.mean(sc)

    @jax.jit
    def spectrum_only(chans, acc):
        s = wm_pallas.spectrum_plane_blocks.__wrapped__(chans)
        return acc + jnp.mean(s)

    @jax.jit
    def spectrum_s3(chans, acc):
        s = wm_pallas.spectrum_plane_blocks.__wrapped__(chans, sweeps=3)
        return acc + jnp.mean(s)

    @jax.jit
    def embed_kernel_s3(chans, sws, acc):
        marked, sc = wm_pallas.embed_plane_blocks.__wrapped__(
            chans, sws, k=4, sweeps=3)
        return acc + jnp.mean(marked) + jnp.mean(sc)

    @jax.jit
    def extract_tail(s_cw, sc, ebasis, iblk, alpha, acc):
        sw_hat = (s_cw - sc) / alpha
        sw_nat = jnp.take(sw_hat[..., :4], iblk, axis=-2)
        blks = jnp.einsum("...nj,...njxy->...nxy", sw_nat,
                          ebasis[..., :4, :, :])
        return acc + jnp.mean(blks)

    mask = (jnp.arange(8) < 4).astype(jnp.float32)
    sws = (alpha * mask * pw.sw).astype(jnp.float32)
    s_cw0 = wm_pallas.spectrum_plane_blocks(c_ops.luma_f32(stego0))

    n = batch * 3 * blocked.n_blocks_of(h, w)
    print(f"batch={batch} frames, {n/1e6:.2f}M blocks per color pass")
    t_full = timed("full step (embed+extract)", full, frames, pw.sw,
                   pw.ebasis, pw.inv_blk, alpha)
    timed("embed only", embed_only, frames, pw.sw, alpha)
    timed("extract only", extract_only, stego0, sc0, pw.ebasis,
          pw.inv_blk, alpha)
    timed("embed kernel (planes in, s2)",
          jax.jit(lambda c, sw, a: a + jnp.mean(
              wm_pallas.embed_plane_blocks.__wrapped__(c, sw, k=4,
                                                       sweeps=2)[0])),
          chans, sws)
    timed("embed kernel (planes in, s4)", embed_kernel_only, chans, sws)
    timed("embed kernel (planes in, s3)", embed_kernel_s3, chans, sws)
    timed("spectrum kernel (planes in, s2)",
          jax.jit(lambda c, a: a + jnp.mean(
              wm_pallas.spectrum_plane_blocks.__wrapped__(c, sweeps=2))),
          chans)
    timed("spectrum kernel (planes in, s4)", spectrum_only, chans)
    timed("spectrum kernel (planes in, s3)", spectrum_s3, chans)
    timed("extract tail (gather+einsum)", extract_tail,
          jnp.broadcast_to(s_cw0[:, None], sc0.shape), sc0,
          pw.ebasis, pw.inv_blk, alpha)
    print(f"full-step fps: {batch / t_full:.1f}")


if __name__ == "__main__":
    sys.exit(main())
