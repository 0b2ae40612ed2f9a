"""Round-3: is the view transpose element-issue-bound? If so, packing
4 u8 pixels into one u32 lane before the [M, wb, 8] -> [M, 8, wb]
transpose (4x fewer elements) should cut it ~4x, with the 8 block-columns
recovered in-kernel by shift/mask (cheap integer vector ops).

Packed layout: plane [P, H, W] u8 -> reshape [.., W/4, 4] -> bitcast u32
[P, H, W/4] -> block view [M, wb, 2] u32 -> transpose -> [R, 8, 2, wb]
window; column c lives in word c//4 at byte c%4.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import wm_pallas
from dctsvd_tpu.ops.wm_pallas import B


def timed(name, fn, args, iters=12):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        return acc + out.reshape(-1)[0].astype(jnp.float32)

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


def view_u8(chans):
    v, _, _, _ = wm_pallas._plane_cols_view(chans)
    return v


def view_f32(chans):
    v, _, _, _ = wm_pallas._plane_cols_view(chans.astype(jnp.float32))
    return v


def view_packed(chans):
    *lead, h, w = chans.shape
    p = int(np.prod(lead))
    hb, wb = h // B, w // B
    words = jax.lax.bitcast_convert_type(
        chans.reshape(p * hb * B, wb, 2, 4), jnp.uint32)   # [M, wb, 2]
    v = jnp.transpose(words, (0, 2, 1))                    # [M, 2, wb]
    return v.reshape(p, hb, B, 2, wb)


def main():
    h, w, batch = 1080, 1920, 32
    rng = np.random.default_rng(0)
    chans = jnp.asarray(rng.integers(0, 256, (batch, 3, h, w), np.uint8))
    jax.block_until_ready(chans)

    # correctness of the packed layout: unpack word/byte and compare
    v8 = np.asarray(view_u8(chans[:1, :1]))
    vp = np.asarray(view_packed(chans[:1, :1]))
    for c in (0, 3, 5):
        got = (vp[..., c // 4, :] >> (8 * (c % 4))) & 0xFF
        assert (got == v8[..., c, :]).all(), c
    print("packed layout correct", flush=True)

    timed("view transpose f32", view_f32, (chans,))
    timed("view transpose u8 ", view_u8, (chans,))
    timed("view transpose u32-packed", view_packed, (chans,))


if __name__ == "__main__":
    sys.exit(main())
