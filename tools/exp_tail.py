"""Extract-tail formulation A/B (VERDICT r3 #2b): the serving extract's
back half (ŝw gather -> k-term pixel-basis contraction -> min-max
normalize -> u8 -> unblockify) was 43 ms per 96 1080p planes in round 3 —
the largest non-Jacobi cost left. The f32 [P, N, 64] block tensor it
materializes is ~800 MB per 96-plane pass (read+write around the
normalize), dwarfing the useful FLOPs (k·64 FMAs/block).

Variants timed here (same inputs, same outputs checked):
  current   — the production _extract_tail_prepared
  nonorm    — normalize=False bound (how much the two extra full passes
              around the normalize actually cost)
  recompute — two-pass XLA: pass 1 reduces min/max straight off the
              fused broadcast-sum producer (no [N, 64] f32 store if XLA
              fuses producer->reduce), pass 2 recomputes the contraction
              fused into the scale/clip/u8 epilogue. Trades 2x the (tiny)
              FLOPs for skipping the f32 materialization. CSE may undo
              the recompute — the timing verdict decides.

Run on hardware: PYTHONPATH=/root/repo:/root/.axon_site python
tools/exp_tail.py [batch]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.models import blocked
from dctsvd_tpu.ops import dct
from dctsvd_tpu.utils.config import BLOCK


def timed(name, fn, *args, iters=12):
    out = fn(*args)
    jax.block_until_ready(out)
    acc = jnp.float32(0.0)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        acc = acc + jnp.sum(out[0].reshape(-1)[:1].astype(jnp.float32))
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:44s} {dt*1e3:8.2f} ms", flush=True)
    return out


@jax.jit
def tail_current(s_cw, sc, ebasis, inv_blk, alpha, sw):
    return (blocked._extract_tail_prepared(
        s_cw, sc, ebasis, inv_blk, alpha, 0.6, True, 1080, 1920,
        sw=sw, to_frames=True, out_u8=True),)


@jax.jit
def tail_nonorm(s_cw, sc, ebasis, inv_blk, alpha, sw):
    return (blocked._extract_tail_prepared(
        s_cw, sc, ebasis, inv_blk, alpha, 0.6, False, 1080, 1920,
        sw=sw, to_frames=True, out_u8=False),)


@jax.jit
def tail_recompute(s_cw, sc, ebasis, inv_blk, alpha, sw):
    k = blocked.k_of_block(0.6)
    h, w = 1080, 1920
    hp, wp = h + (-h) % BLOCK, w + (-w) % BLOCK
    raw = (s_cw - sc) / jnp.maximum(alpha, 1e-8)
    est, _ = blocked._shrink_sw_hat(raw, sw, k)
    sw_nat = blocked._permute_slots(est[..., :k], inv_blk)
    eb = ebasis[..., :k, :, :]
    eb64 = eb.reshape(*eb.shape[:-2], BLOCK * BLOCK)

    def produce():
        # broadcast-sum, not dot: elementwise producers fuse into the
        # consuming reduction / epilogue without a [N, 64] f32 store
        return jnp.sum(sw_nat[..., :, None] * eb64, axis=-2)

    lo = jnp.min(produce(), axis=(-2, -1), keepdims=True)
    hi = jnp.max(produce(), axis=(-2, -1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
    out = jnp.clip((produce() - lo) * scale, 0, 255).astype(jnp.uint8)
    out = out.reshape(*out.shape[:-1], BLOCK, BLOCK)
    return (blocked._unblockify_to_frames(out, hp, wp),)


def main(batch=32):
    # 1080 and 1920 are both block-aligned, so the production tail takes
    # the block-level (pre-transpose normalize) branch at this shape
    hp, wp = 1080, 1920
    rng = np.random.default_rng(0)
    n = (hp // 8) * (wp // 8)
    sc_np = rng.random((batch, 3, n, 8), np.float32) * 50
    sw_np = rng.random((3, n, 8), np.float32) * 40
    # serving-like stego spectrum (mark present + small codec-ish noise)
    # so the estimator's presence switch engages like in production
    s_cw = jnp.asarray(sc_np + 0.12 * sw_np
                       + rng.normal(0, 0.5, sc_np.shape).astype(np.float32))
    sc = jnp.asarray(sc_np)
    sw = jnp.asarray(sw_np)
    ebasis = jnp.asarray(rng.standard_normal((3, n, 8, 8, 8))
                         .astype(np.float32))
    inv_blk = jnp.asarray(rng.permutation(n))
    alpha = jnp.float32(0.12)

    # absorb the one-time remote compiles of the timing loop's own tiny
    # eager ops (acc chain): they cost ~0.5 s EACH on the axon platform
    # and land entirely on whichever variant is timed first, inflating it
    # ~20x at batch 8 (tools/exp_tail2.py isolated this; round 4)
    timed("warmup (discard)", tail_recompute,
          s_cw, sc, ebasis, inv_blk, alpha, sw)
    cur = timed("tail current (normalize, u8, frames)", tail_current,
                s_cw, sc, ebasis, inv_blk, alpha, sw)
    timed("tail normalize=False bound", tail_nonorm,
          s_cw, sc, ebasis, inv_blk, alpha, sw)
    rec = timed("tail recompute-fused two-pass", tail_recompute,
                s_cw, sc, ebasis, inv_blk, alpha, sw)
    diff = (np.asarray(cur[0], np.int32) - np.asarray(rec[0], np.int32))
    print(f"current vs recompute: max|diff|={np.abs(diff).max()} "
          f"(expect <=1 from independent rounding)")


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    args = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*args)
