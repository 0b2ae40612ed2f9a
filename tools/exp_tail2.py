"""Isolate the residual cost of the production tail vs the bare
recompute form (both post-flip, bit-identical): the only deltas are the
erasure-flag machinery (combo concat + (k+1)-column permute) and the
bad_nat branch of _normalize_blocks_recompute. Time each piece swapped
in alone.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tail2.py [batch]
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
from dctsvd_tpu.utils.config import BLOCK


def timed(name, fn, *args, iters=12):
    # accumulate a data dependency across iterations — the remote runtime
    # memoizes byte-identical dispatches otherwise (exp_tail.py pattern)
    out = fn(*args)
    jax.block_until_ready(out)
    acc = jnp.float32(0.0)
    t0 = time.time()
    for _ in range(iters):
        out = fn(args[0] + acc.astype(args[0].dtype) * 0, *args[1:])
        acc = acc + jnp.sum(out.reshape(-1)[:1].astype(jnp.float32))
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return out


def make_tail(use_flags, use_bad_branch, do_median=True):
    h, w = 1080, 1920
    k = blocked.k_of_block(0.6)

    @jax.jit
    def tail(s_cw, sc, ebasis, inv_blk, alpha, sw):
        raw = (s_cw - sc) / jnp.maximum(alpha, 1e-8)
        if do_median:
            est, bad = blocked._shrink_sw_hat(raw, sw, k)
        else:
            est, bad = raw, jnp.zeros(raw.shape[:-1], bool)
        sw_hat = est[..., :k]
        if use_flags:
            combo = jnp.concatenate(
                [sw_hat, bad.astype(jnp.float32)[..., None]], axis=-1)
            combo = blocked._permute_slots(combo, inv_blk)
            sw_nat, bad_nat = combo[..., :k], combo[..., k] > 0.5
        else:
            sw_nat = blocked._permute_slots(sw_hat, inv_blk)
            bad_nat = jnp.zeros(sw_nat.shape[:-1], bool)
        eb = ebasis[..., :k, :, :]
        eb64 = eb.reshape(*eb.shape[:-2], BLOCK * BLOCK)

        def produce():
            return jnp.sum(sw_nat[..., :, None] * eb64, axis=-2)

        blocks = blocked._normalize_blocks_recompute(
            produce, bad_nat if use_bad_branch else None, True, True)
        blocks = blocks.reshape(*blocks.shape[:-1], BLOCK, BLOCK)
        return blocked._unblockify_to_frames(blocks, h, w)

    return tail


def main(batch=8):
    hp, wp = 1080, 1920
    rng = np.random.default_rng(0)
    n = (hp // 8) * (wp // 8)
    sc_np = rng.random((batch, 3, n, 8), np.float32) * 50
    sw_np = rng.random((3, n, 8), np.float32) * 40
    s_cw = jnp.asarray(sc_np + 0.12 * sw_np
                       + rng.normal(0, 0.5, sc_np.shape).astype(np.float32))
    sc = jnp.asarray(sc_np)
    sw = jnp.asarray(sw_np)
    ebasis = jnp.asarray(rng.standard_normal((3, n, 8, 8, 8))
                         .astype(np.float32))
    inv_blk = jnp.asarray(rng.permutation(n))
    alpha = jnp.float32(0.12)
    args = (s_cw, sc, ebasis, inv_blk, alpha, sw)

    timed("bare (no flags, no bad branch)", make_tail(False, False), *args)
    timed("bare, no shrink-median either", make_tail(False, False, False),
          *args)
    timed("+ combo concat/permute only", make_tail(True, False), *args)
    timed("+ bad_nat normalize branch only", make_tail(False, True), *args)
    timed("full production equivalent", make_tail(True, True), *args)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    args = [int(a) for a in sys.argv[1:] if a.isdigit()]
    main(*args)
