"""A/B: final singular values from the Rutishauser-cached norms instead
of fresh ||g||² reductions (saves 8 x 4 = 32 full-width ops per kernel
invocation) — plus accuracy of the cached values vs fresh."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctsvd_tpu.ops import wm_pallas
from dctsvd_tpu.ops.wm_pallas import (
    B, _COMPILER_PARAMS, _SORT_NET, _rotation, _sum_rows, _widen,
    _plane_cols_view)


def _make_spectrum_cached(sweeps: int):
    def kernel(x_ref, s_ref):
        x = _widen(x_ref[0])
        g = [x[:, :, c, :] for c in range(B)]
        norms = [_sum_rows(c * c) for c in g]

        def sweep(_, carry):
            g, norms = list(carry[0]), list(carry[1])
            for p, q in wm_pallas.PAIRS:
                gp, gq = g[p], g[q]
                app, aqq = norms[p], norms[q]
                apq = _sum_rows(gp * gq)
                c, s, t, _ = _rotation(app, aqq, apq)
                norms[p] = app - t * apq
                norms[q] = aqq + t * apq
                c, s = c[..., None, :], s[..., None, :]
                g[p] = c * gp - s * gq
                g[q] = s * gp + c * gq
            return tuple(g), tuple(norms)

        g, norms = jax.lax.fori_loop(0, sweeps, sweep,
                                     (tuple(g), tuple(norms)))
        s = [jnp.sqrt(jnp.maximum(norms[i], 0.0)) for i in range(B)]
        for i, j in _SORT_NET:
            swap = s[i] < s[j]
            si, sj = s[i], s[j]
            s[i] = jnp.where(swap, sj, si)
            s[j] = jnp.where(swap, si, sj)
        s_ref[0] = jnp.stack(s, axis=1)

    return kernel


def spectrum_cached(planes, sweeps, rows):
    view, lead, hb, wb = _plane_cols_view(planes)
    p = view.shape[0]
    grid = (p, hb // rows)
    s = pl.pallas_call(
        _make_spectrum_cached(sweeps), grid=grid,
        in_specs=[pl.BlockSpec((1, rows, B, B, wb),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, B, wb), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, hb, B, wb), jnp.float32),
        compiler_params=_COMPILER_PARAMS)(view)
    return jnp.transpose(s.reshape(-1, B, wb),
                         (0, 2, 1)).reshape(*lead, hb * wb, B)


def timed(name, fn, *args, iters=10):
    @jax.jit
    def step(acc, *a):
        return acc + fn(*a).reshape(-1)[0]

    acc = step(jnp.float32(0.0), *args)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    print(f"{name:40s} {(time.time()-t0)/iters*1e3:8.2f} ms/iter",
          flush=True)


def main():
    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((96, h, w)).astype(np.float32) * 40 + 128)
    jax.block_until_ready(planes)
    timed("spectrum fresh  s2 rows=3",
          lambda p: wm_pallas.spectrum_plane_blocks.__wrapped__(
              p, sweeps=2, rows=3), planes)
    timed("spectrum cached s2 rows=3",
          lambda p: spectrum_cached(p, 2, 3), planes)
    # accuracy: cached vs fresh vs converged
    s_fresh = np.asarray(wm_pallas.spectrum_plane_blocks(
        planes[:2], sweeps=2, rows=3))
    s_cached = np.asarray(spectrum_cached(planes[:2], 2, 3))
    rel = np.abs(s_cached - s_fresh) / (s_fresh[..., :1] + 1e-9)
    print(f"cached vs fresh rel dev: mean {rel.mean():.2e} "
          f"max {rel.max():.2e}")


if __name__ == "__main__":
    sys.exit(main())
