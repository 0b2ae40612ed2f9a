"""VPU issue-rate roofline for the Jacobi sweep body (VERDICT r2 #1).

Measures the chip's sustainable full-width vector-op rate on EXACTLY the
value shape the serving kernels carry ([R, 8, Wb] f32 per column), via a
Pallas kernel that runs a long unrolled chain of multiply/add ops:

  - 'ilp8': 8 independent accumulator chains (issue-rate ceiling)
  - 'serial': one dependent chain (latency floor)

The Jacobi sweep body (28 pairs x ~10 full-width ops + ~18 scalar-chain
ops with 2 rsqrts per rotation) sits between these bounds; comparing its
measured op rate against the ilp8 ceiling gives the fraction of the VPU
the kernel achieves — the roofline that bounds any further single-chip
speedup at fixed op count."""
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

from dctsvd_tpu.ops.wm_pallas import _COMPILER_PARAMS, B


def _make_kernel(n_ops: int, mode: str):
    def kernel(x_ref, o_ref):
        x = x_ref[0]                                  # [R, 8, Wb]
        if mode == "ilp8":
            accs = [x * (1.0 + 0.0625 * i) for i in range(8)]
            ops = 8
            while ops < n_ops:
                for i in range(8):
                    accs[i] = accs[i] * 1.0000001 + x
                    ops += 2
            out = accs[0]
            for i in range(1, 8):
                out = out + accs[i]
        else:
            out = x
            ops = 0
            while ops < n_ops:
                out = out * 1.0000001 + x
                ops += 2
        o_ref[0] = out

    return kernel


def run(mode: str, n_ops: int, rows: int, planes, hb, wb, iters=8):
    p = planes.shape[0]
    grid = (p, hb // rows)
    f = jax.jit(lambda v: pl.pallas_call(
        _make_kernel(n_ops, mode), grid=grid,
        in_specs=[pl.BlockSpec((1, rows, B, wb),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, B, wb), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, hb, B, wb), jnp.float32),
        compiler_params=_COMPILER_PARAMS)(v))

    @jax.jit
    def step(acc, v):
        return acc + f(v)[0, 0, 0, 0]

    acc = step(jnp.float32(0.0), planes)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, planes)
    float(acc)
    dt = (time.time() - t0) / iters
    cells = p * (hb // rows)
    elems_per_op = rows * B * wb
    total_ops = cells * n_ops * elems_per_op
    rate = total_ops / dt
    print(f"{mode:8s} n_ops={n_ops:4d} rows={rows}  {dt*1e3:7.2f} ms  "
          f"{rate/1e12:6.3f} Telem-ops/s", flush=True)
    return rate


def main():
    h, w, nplanes = 1080, 1920, 96
    hb, wb = h // B, w // B
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.standard_normal((nplanes, hb, B, wb)).astype(np.float32))
    jax.block_until_ready(planes)
    for mode in ("ilp8", "serial"):
        for n_ops in (256, 1024):
            run(mode, n_ops, 3, planes, hb, wb)
    # the serving sweep for comparison: 28 pairs x (4-op dot + 6-op
    # column update) = 280 full-width ops/sweep at ~8.3 ms per 96-plane
    # pass (tools/exp_sweepcost.py) on [3, 8, 240] values
    cells = 96 * (hb // 3)
    sweep_rate = cells * 280 * (3 * B * wb) / 8.3e-3
    print(f"jacobi sweep body (280 full ops / 8.3 ms): "
          f"{sweep_rate/1e12:6.3f} Telem-ops/s (excl. scalar chain)")


if __name__ == "__main__":
    sys.exit(main())
