"""Round-3: fold the channel moveaxis into the view transpose?

Serving steps currently pay, per frame batch: moveaxis [B,H,W,3]->[B,3,H,W]
(u8) + the block view transpose, and the inverses on the way out. A single
composite rank-6 permutation could replace each pair — but round 2 showed
XLA tiles rank-3 transposes and scalarizes rank-5, so measure, don't
assume.
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
    print(f"{name:48s} {dt:8.2f} ms/iter", flush=True)
    return dt


def two_pass(frames):
    chans = jnp.moveaxis(frames, -1, -3)
    v, _, _, _ = wm_pallas._plane_cols_view(chans)
    return v


def composite(frames):
    bt, h, w, ch = frames.shape
    hb, wb = h // B, w // B
    x = frames.reshape(bt, hb, B, wb, B, ch)
    v = jnp.transpose(x, (0, 5, 1, 2, 4, 3))
    return v.reshape(bt * ch, hb, B, B, wb)


def out_two_pass(view, bt, h, w, ch):
    hb, wb = h // B, w // B
    flat = jnp.transpose(view.reshape(-1, B, wb), (0, 2, 1))
    chans = flat.reshape(bt, ch, h, w)
    return jnp.moveaxis(chans, -3, -1)


def out_composite(view, bt, h, w, ch):
    hb, wb = h // B, w // B
    x = view.reshape(bt, ch, hb, B, B, wb)
    y = jnp.transpose(x, (0, 2, 3, 5, 4, 1))
    return y.reshape(bt, h, w, ch)


def main():
    h, w, batch, ch = 1080, 1920, 32, 3
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (batch, h, w, ch), np.uint8))
    jax.block_until_ready(frames)

    a = np.asarray(two_pass(frames[:1]))
    b = np.asarray(composite(frames[:1]))
    assert (a == b).all()
    view = composite(frames)
    oa = np.asarray(out_two_pass(view[:3], 1, h, w, ch))
    ob = np.asarray(out_composite(view[:3], 1, h, w, ch))
    assert (oa == ob).all()
    print("composite forms correct", flush=True)

    timed("IN  moveaxis+view (two pass) u8", two_pass, (frames,))
    timed("IN  composite rank-6 u8", composite, (frames,))
    timed("OUT view->moveaxis (two pass) u8",
          lambda v: out_two_pass(v, batch, h, w, ch), (view,))
    timed("OUT composite rank-6 u8",
          lambda v: out_composite(v, batch, h, w, ch), (view,))
    timed("moveaxis alone u8", lambda f: jnp.moveaxis(f, -1, -3), (frames,))


if __name__ == "__main__":
    sys.exit(main())
