"""Round-3 serving-step decomposition at the shipped defaults (u8
channels-last, sweeps=_FUSED_SWEEPS) — where do the step's milliseconds
live AFTER the view-transpose/u8 work?  Chained-accumulator methodology
(see bench.py)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.models import blocked
from dctsvd_tpu.ops import wm_pallas
from dctsvd_tpu.utils import crypto


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
    print(f"{name:46s} {dt*1e3:8.2f} ms/iter", flush=True)
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
    print(f"batch={batch} frames (x3 planes), sweeps={blocked._FUSED_SWEEPS}")

    @jax.jit
    def full(frames, sw, ebasis, iblk, alpha, acc):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        rec = blocked.extract_color_prepared.__wrapped__(
            stego, sc, ebasis, iblk, alpha, sw=sw)
        return (acc + rec.reshape(-1)[0].astype(jnp.float32)
                + stego.reshape(-1)[0].astype(jnp.float32)
                + sc.reshape(-1)[0])

    @jax.jit
    def embed_only(frames, sw, alpha, acc):
        stego, sc, _, _ = blocked.embed_color_prepared.__wrapped__(
            frames, sw, alpha, with_metrics=False)
        return (acc + stego.reshape(-1)[0].astype(jnp.float32)
                + sc.reshape(-1)[0])

    stego0, sc0, _, _ = blocked.embed_color_prepared(
        frames, pw.sw, alpha, with_metrics=False)

    @jax.jit
    def extract_only(stego, sc, ebasis, iblk, alpha, sw, acc):
        rec = blocked.extract_color_prepared.__wrapped__(
            stego, sc, ebasis, iblk, alpha, sw=sw)
        return acc + rec.reshape(-1)[0].astype(jnp.float32)

    @jax.jit
    def spectrum_frames(stego, acc):
        s = blocked._frames_spectrum(stego)
        return acc + s.reshape(-1)[0]

    s_cw0 = blocked._frames_spectrum(stego0)

    @jax.jit
    def tail_only(s_cw, sc, ebasis, iblk, alpha, sw, acc):
        wm = blocked._extract_tail_prepared(
            s_cw, sc, ebasis, iblk, alpha, blocked.K_FRAC_DEFAULT,
            True, h, w, sw=sw)
        return acc + wm.reshape(-1)[0]

    @jax.jit
    def inview_u8(frames, acc):
        v, lead, hb, wb = wm_pallas._frames_cols_view(frames)
        return acc + v[0, 0, 0, 0, :8].astype(jnp.float32).sum()

    t_full = timed("full serving step (embed+extract)", full, frames,
                   pw.sw, pw.ebasis, pw.inv_blk, alpha)
    t_e = timed("embed_color_prepared", embed_only, frames, pw.sw, alpha)
    t_x = timed("extract_color_prepared", extract_only, stego0, sc0,
                pw.ebasis, pw.inv_blk, alpha, pw.sw)
    t_s = timed("  spectrum (channels-last u8)", spectrum_frames, stego0)
    t_t = timed("  extract tail (einsum+norm+moveaxis)", tail_only,
                s_cw0, sc0, pw.ebasis, pw.inv_blk, alpha, pw.sw)
    timed("  in-view transpose u8 alone", inview_u8, stego0)
    print(f"embed+extract sum of parts: {1e3*(t_e + t_x):.1f} ms; "
          f"extract = spectrum {1e3*t_s:.1f} + tail {1e3*t_t:.1f}")
    print(f"full-step fps: {batch / t_full:.1f}")


def tail_parts():
    """Finer tail decomposition: einsum alone vs normalize vs transpose."""
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
    stego0, sc0, _, _ = blocked.embed_color_prepared(
        frames, pw.sw, alpha, with_metrics=False)
    s_cw0 = blocked._frames_spectrum(stego0)
    k = 4
    eb = pw.ebasis[..., :k, :, :]
    eb64 = jnp.asarray(eb.reshape(*eb.shape[:-2], 64))

    @jax.jit
    def head_only(s_cw, sc, sw, iblk, alpha, acc):
        raw = (s_cw - sc) / jnp.maximum(alpha, 1e-8)
        sw_hat, bad = blocked._shrink_sw_hat(raw, sw, k)
        sw_nat = jnp.take(sw_hat[..., :k], iblk, axis=-2)
        return (acc + sw_nat.reshape(-1)[0]
                + bad.astype(jnp.float32).reshape(-1)[0])

    @jax.jit
    def einsum_only(sw_nat, eb64, acc):
        blocks = jnp.einsum("...nj,...njp->...np", sw_nat, eb64)
        return acc + blocks.reshape(-1)[0]

    @jax.jit
    def einsum_norm(sw_nat, eb64, bad_nat, acc):
        blocks = jnp.einsum("...nj,...njp->...np", sw_nat, eb64)
        blocks = blocked._normalize_blocks(blocks, bad_nat, True)
        return acc + blocks.reshape(-1)[0]

    @jax.jit
    def einsum_norm_frames(sw_nat, eb64, bad_nat, acc):
        blocks = jnp.einsum("...nj,...njp->...np", sw_nat, eb64)
        blocks = blocked._normalize_blocks(blocks, bad_nat, True)
        blocks = blocks.reshape(*blocks.shape[:-1], 8, 8)
        y = blocked._unblockify_to_frames(blocks, 1080, 1920)
        return acc + jnp.clip(y, 0, 255).astype(jnp.uint8
                                                ).reshape(-1)[0].astype(jnp.float32)

    raw = (s_cw0 - sc0) / alpha
    _, bad0 = blocked._shrink_sw_hat(raw, pw.sw, k)
    bad_nat = jnp.take(bad0, pw.inv_blk, axis=-1)
    sw_nat = jnp.take(blocked._clamp_sw_hat(raw, pw.sw)[..., :k],
                      pw.inv_blk, axis=-2)
    timed("tail: head (clamp+erasure+gather)", head_only, s_cw0, sc0,
          pw.sw, pw.inv_blk, alpha)
    timed("tail: einsum only", einsum_only, sw_nat, eb64)
    timed("tail: einsum+blocknorm", einsum_norm, sw_nat, eb64, bad_nat)
    timed("tail: einsum+norm+frames+u8", einsum_norm_frames, sw_nat, eb64,
          bad_nat)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "tail":
        tail_parts()
        sys.exit(0)
    sys.exit(main())
