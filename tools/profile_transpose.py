"""Find a fast [.., 8row, wb, 8col] -> [.., 8row, 8col, wb] transpose.

XLA's native lowering measured ~40 ms per 796 MB pass (~20 GB/s — scalar
path), as much as the whole 4-sweep Jacobi kernel. Candidates:
  T1  XLA swapaxes (baseline), forced via copy-kernel consumer
  T2  3-D reshape + transpose
  T3  identity-contraction einsum (dot_general -> MXU does the shuffle)
  T4  u8 transpose + f32 convert (4x fewer bytes through the slow path)
  T5  pallas kernel: in-VMEM per-vreg lane gather (jnp.take on lanes)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, fn, *args, iters=12):
    try:
        acc = jnp.float32(0.0)
        _ = float(fn(*args, acc))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__} {str(e)[:2000]}",
              flush=True)
        return None
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc)
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def copy_consumer(v, r=9):
    """Force materialization through a trivial pallas copy."""
    p, hb, a, b, wb = v.shape

    def copyk(x_ref, o_ref):
        o_ref[...] = x_ref[...]
    return pl.pallas_call(
        copyk, grid=(p, hb // r),
        in_specs=[pl.BlockSpec((1, r, a, b, wb),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, a, b, wb),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype))(v)


def main():
    h, w, batch = 1080, 1920, 32
    p, hb, wb = batch * 3, h // 8, w // 8
    rng = np.random.default_rng(0)
    chans = jnp.asarray(rng.standard_normal(
        (p, h, w)).astype(np.float32))
    chans_u8 = jnp.asarray(rng.integers(0, 256, (p, h, w), np.uint8))
    jax.block_until_ready((chans, chans_u8))

    @jax.jit
    def t1(chans, acc):
        v = chans.reshape(p, hb, 8, wb, 8)
        v = jnp.swapaxes(v, 3, 4)
        return acc + jnp.mean(copy_consumer(v))

    @jax.jit
    def t2(chans, acc):
        x = chans.reshape(p * hb * 8, wb, 8)
        v = jnp.transpose(x, (0, 2, 1)).reshape(p, hb, 8, 8, wb)
        return acc + jnp.mean(copy_consumer(v))

    eye = jnp.eye(8, dtype=jnp.float32)

    @jax.jit
    def t3(chans, acc):
        x = chans.reshape(p, hb, 8, wb, 8)
        v = jnp.einsum("phrwc,ck->phrkw", x, eye)
        return acc + jnp.mean(copy_consumer(v))

    @jax.jit
    def t4(chans_u8, acc):
        x = chans_u8.reshape(p, hb, 8, wb, 8)
        v = jnp.swapaxes(x, 3, 4).astype(jnp.float32)
        return acc + jnp.mean(copy_consumer(v))

    # T5: pallas lane-gather transpose. Input natural [p, hb, 8, wb*8]
    # (pure reshape); per 128-lane vreg the [16 blocks, 8 cols] -> [8, 16]
    # transpose is a static lane permutation; output block order along wb
    # becomes (group, block-in-group) interleaved — the kernel consumers
    # don't care about block order, and [N,8]-sized side arrays are cheap
    # to permute outside.
    lane = np.arange(w, dtype=np.int32)
    g, r128 = lane // 128, lane % 128
    perm = g * 128 + (r128 % 16) * 8 + r128 // 16
    perm_d = jnp.asarray(perm % 128)  # per-vreg indices (same every group)

    r = 9

    def gatherk(x_ref, o_ref):
        x = x_ref[0]                          # [r, 8, w]
        xb = x.reshape(x.shape[0], 8, x.shape[2] // 8, 8)
        o_ref[0] = jnp.swapaxes(xb, -1, -2).reshape(x.shape)

    @jax.jit
    def t5(chans, acc):
        x = chans.reshape(p, hb, 8, w)
        v = pl.pallas_call(
            gatherk, grid=(p, hb // r),
            in_specs=[pl.BlockSpec((1, r, 8, w),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, r, 8, w),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((p, hb, 8, w), jnp.float32))(x)
        return acc + jnp.mean(v)

    import os
    which = os.environ.get("T", "12345")
    if "1" in which:
        timed("T1 XLA swapaxes f32", t1, chans)
    if "2" in which:
        timed("T2 3-D transpose f32", t2, chans)
    if "3" in which:
        timed("T3 einsum-identity (MXU) f32", t3, chans)
    if "4" in which:
        timed("T4 u8 swapaxes + convert", t4, chans_u8)
    if "5" in which:
        timed("T5 pallas lane-gather (permuted blocks)", t5, chans)


if __name__ == "__main__":
    sys.exit(main())
