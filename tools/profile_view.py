"""Isolate the XLA view-transpose cost around the fused kernels."""
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


def timed(name, fn, *args, iters=12):
    acc = jnp.float32(0.0)
    _ = float(fn(*args, acc))
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc)
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    h, w, batch = 1080, 1920, 32
    rng = np.random.default_rng(0)
    chans = jnp.asarray(rng.standard_normal(
        (batch, 3, h, w)).astype(np.float32) * 50 + 128)
    view = jax.jit(
        lambda c: wm_pallas._plane_cols_view(c)[0])(chans)
    jax.block_until_ready((chans, view))
    p, hb, _, _, wb = view.shape
    r = wm_pallas._rows_per_cell(hb, wb)
    kernel = wm_pallas._make_spectrum_kernel(4)
    grid = (p, hb // r)

    def call_kernel(v):
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pl.BlockSpec((1, r, 8, 8, wb),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, r, 8, wb), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p, hb, 8, wb), jnp.float32),
            compiler_params=wm_pallas._COMPILER_PARAMS)(v)

    @jax.jit
    def with_transpose(chans, acc):
        v, _, _, _ = wm_pallas._plane_cols_view(chans)
        return acc + jnp.mean(call_kernel(v))

    @jax.jit
    def pre_transposed(view, acc):
        return acc + jnp.mean(call_kernel(view))

    @jax.jit
    def transpose_forced(chans, acc):
        # pallas copy kernel consumer forces the transpose to materialize
        v, _, _, _ = wm_pallas._plane_cols_view(chans)

        def copyk(x_ref, o_ref):
            o_ref[...] = x_ref[...]
        o = pl.pallas_call(
            copyk, grid=(p, hb // r),
            in_specs=[pl.BlockSpec((1, r, 8, 8, wb),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, r, 8, 8, wb),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(view.shape, jnp.float32))(v)
        return acc + jnp.mean(o)

    timed("spectrum kernel + in-transpose", with_transpose, chans)
    timed("spectrum kernel, pre-transposed input", pre_transposed, view)
    timed("transpose alone (forced via copy kernel)", transpose_forced,
          chans)


if __name__ == "__main__":
    sys.exit(main())
