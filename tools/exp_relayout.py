"""Round-3 retry of the in-kernel relayout (VERDICT r2 #1c).

Round 2's formulations crashed the Mosaic remote compiler (HTTP 500); a 3-D
strided lane slice now dies locally ("Only 2D gather is supported"). This
tries the remaining formulations:

  A: 2-D strided lane slice  x2d[:, c::8]   (2-D gather IS supported)
  B: in-kernel minor transpose x.reshape(R,8,Wb,8).swapaxes(-1,-2)
  C: lax.slice 2-D with strides

on a natural-layout window [R*8, W], against the shipped kernel whose input
rides a 12 ms XLA transpose.
"""
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
from dctsvd_tpu.ops.wm_pallas import B, _jacobi_cols, _COMPILER_PARAMS


def _make_kernel(sweeps: int, form: str):
    def kernel(x_ref, s_ref):
        x2 = x_ref[0]                         # [R*8, W]
        r8, w = x2.shape
        r, wb = r8 // B, w // B
        if form == "slice2d":
            xc = [x2[:, c::B].reshape(r, B, wb) for c in range(B)]
        elif form == "laxslice":
            xc = [jax.lax.slice(x2, (0, c), (r8, w), (1, B)
                                ).reshape(r, B, wb) for c in range(B)]
        elif form == "transpose":
            xt = x2.reshape(r, B, wb, B)
            xt = jnp.swapaxes(xt, -1, -2)     # [R, 8, 8(col), Wb]
            xc = [xt[:, :, c, :] for c in range(B)]
        else:
            raise ValueError(form)
        s = _jacobi_cols(xc, sweeps, compute_uv=False)
        s_ref[0] = jnp.stack(s, axis=1)       # [R, 8, Wb]
    return kernel


def spectrum_nat(planes, sweeps=3, rows=3, form="slice2d"):
    *lead, h, w = planes.shape
    p = 1
    for d in lead:
        p *= d
    hb, wb = h // B, w // B
    flat = planes.reshape(p, h, w).astype(jnp.float32)
    grid = (p, hb // rows)
    s = pl.pallas_call(
        _make_kernel(sweeps, form), grid=grid,
        in_specs=[pl.BlockSpec((1, rows * B, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, B, wb), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, hb, B, wb), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        )(flat)
    return jnp.transpose(s.reshape(-1, B, wb),
                         (0, 2, 1)).reshape(*lead, hb * wb, B)


def timed(name, fn, args, iters=8):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
        return acc

    acc = step(jnp.float32(0.0), *args)
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
    chans = jnp.asarray(
        rng.standard_normal((batch, 3, h, w)).astype(np.float32) * 40 + 128)
    jax.block_until_ready(chans)

    small = chans[:1, :1, :24, :64]
    ref = wm_pallas.spectrum_plane_blocks.__wrapped__(small, sweeps=3, rows=3)
    ok = []
    for form in ("slice2d", "laxslice", "transpose"):
        try:
            got = spectrum_nat(small, sweeps=3, rows=3, form=form)
            err = float(jnp.max(jnp.abs(ref - got)))
            print(f"form={form:10s} max err {err:.3e}", flush=True)
            if err < 1e-3:
                ok.append(form)
        except Exception as e:  # noqa: BLE001
            print(f"form={form:10s} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[-1][:140]}", flush=True)

    timed("spectrum SHIPPED  s3 rows=3", lambda x: (
        wm_pallas.spectrum_plane_blocks.__wrapped__(x, sweeps=3, rows=3)),
        (chans,))
    for form in ok:
        timed(f"spectrum NATURAL/{form} s3 rows=3",
              lambda x, form=form: spectrum_nat(x, 3, 3, form), (chans,))


if __name__ == "__main__":
    sys.exit(main())
