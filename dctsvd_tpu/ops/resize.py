"""INTER_AREA-equivalent resize, jit-safe, matching cv2's semantics.

The reference resizes the watermark to the cover size with
``cv2.resize(wm, (W, H), interpolation=cv2.INTER_AREA)``
(ref: app_dct_svd_single.py:118). cv2's INTER_AREA has two regimes
(verified empirically against cv2 5.0 in tests/test_resize.py):

  1. both axes shrinking: true area averaging — exact box mean for integer
     factors (ties round half-to-even via cvRound), area-weighted average
     for fractional factors;
  2. otherwise ("zoom" path, also taken when one axis shrinks while the
     other grows): per-axis taps ``sx = floor(dx*scale)``,
     ``fx = (dx+1) − (sx+1)*dst/src``, snapped to 0 when ≤ 0, evaluated in
     cv2's 11-bit fixed point (weights = round(w·2048), u8 result =
     (acc + 2^21) >> 22) — reproduced here bit-exactly with integer
     gathers, which is how the u8 path below is exact.

The float variant uses the same taps with float weights (for on-device
pipelines where inputs are already float planes); the u8 variant is the
bit-exact one used for reference parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _shrink_weights_np(src: int, dst: int) -> np.ndarray:
    """[dst, src] area-average weights for a shrinking axis."""
    w = np.zeros((dst, src), np.float64)
    scale = src / dst
    for d in range(dst):
        lo = d * scale
        hi = (d + 1) * scale
        i0 = int(np.floor(lo))
        i1 = int(np.ceil(hi))
        for i in range(i0, min(i1, src)):
            cover = min(hi, i + 1) - max(lo, i)
            if cover > 0:
                w[d, i] = cover
        w[d] /= w[d].sum()
    return w


@functools.lru_cache(maxsize=128)
def _zoom_taps_np(src: int, dst: int):
    """(sx0, sx1, fx) int/float tap arrays for cv2's INTER_AREA zoom path."""
    scale = src / dst
    inv = dst / src
    sx = np.minimum(np.floor(np.arange(dst) * scale).astype(np.int64),
                    src - 1)
    # cv2 stores fx as C float — the f32 cast shifts some boundary weights
    fx = (((np.arange(dst) + 1) - (sx + 1) * inv)).astype(np.float32)
    fx = np.where(fx <= 0, np.float32(0), fx - np.floor(fx))
    sx1 = np.minimum(sx + 1, src - 1)
    return sx, sx1, fx


def _round_even(x: np.ndarray) -> np.ndarray:
    return np.round(x).astype(np.int64)


def resize_area_u8(img_u8: jax.Array, out_h: int, out_w: int,
                   channels_last: bool | None = None) -> jax.Array:
    """Bit-exact cv2.resize(img, (out_w, out_h), INTER_AREA) for uint8
    [..., H, W] or [..., H, W, C] inputs.

    ``channels_last=None`` infers the layout like cv2 callers expect
    (a trailing dim of <= 4 on a >=3-D array is a channel axis — the
    C in {1, 3, 4} cases this framework produces). The inference CANNOT
    distinguish e.g. a [B, H, 4] plane batch from an [H, W, 4] RGBA
    image; pass ``channels_last`` explicitly for such shapes."""
    chan = (img_u8.ndim >= 3 and img_u8.shape[-1] <= 4
            if channels_last is None else channels_last)
    x = jnp.moveaxis(img_u8, -1, 0) if chan else img_u8
    h, w = x.shape[-2], x.shape[-1]

    if out_h <= h and out_w <= w:
        wy = jnp.asarray(_shrink_weights_np(h, out_h), jnp.float32)
        wx = jnp.asarray(_shrink_weights_np(w, out_w), jnp.float32)
        y = jnp.einsum("oh,...hw->...ow", wy, x.astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("...ow,pw->...op", y, wx,
                       precision=jax.lax.Precision.HIGHEST)
        out = jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
    else:
        sy0, sy1, fy = _zoom_taps_np(h, out_h)
        sx0, sx1, fx = _zoom_taps_np(w, out_w)
        wy0 = jnp.asarray(_round_even((1 - fy) * 2048), jnp.int32)
        wy1 = jnp.asarray(_round_even(fy * 2048), jnp.int32)
        wx0 = jnp.asarray(_round_even((1 - fx) * 2048), jnp.int32)
        wx1 = jnp.asarray(_round_even(fx * 2048), jnp.int32)
        xi = x.astype(jnp.int32)
        hpass = (jnp.take(xi, jnp.asarray(sx0), axis=-1) * wx0
                 + jnp.take(xi, jnp.asarray(sx1), axis=-1) * wx1)
        # cv2's u8 VResizeLinear truncation sequence (resize.cpp):
        # ((b0*(S0>>4))>>16 + (b1*(S1>>4))>>16 + 2) >> 2
        s0 = jnp.take(hpass, jnp.asarray(sy0), axis=-2) >> 4
        s1 = jnp.take(hpass, jnp.asarray(sy1), axis=-2) >> 4
        vpass = ((wy0[:, None] * s0) >> 16) + ((wy1[:, None] * s1) >> 16)
        out = jnp.clip((vpass + 2) >> 2, 0, 255).astype(jnp.uint8)

    return jnp.moveaxis(out, 0, -1) if chan else out


def resize_area(img: jax.Array, out_h: int, out_w: int,
                channels_last: bool | None = None) -> jax.Array:
    """Float INTER_AREA resize of [..., H, W] or [..., H, W, C] arrays
    (unquantized weights — for on-device float pipelines);
    ``channels_last`` as in :func:`resize_area_u8`."""
    chan = (img.ndim >= 3 and img.shape[-1] <= 4
            if channels_last is None else channels_last)
    x = jnp.moveaxis(img, -1, 0) if chan else img
    h, w = x.shape[-2], x.shape[-1]
    xf = x.astype(jnp.float32)

    if out_h <= h and out_w <= w:
        wy = jnp.asarray(_shrink_weights_np(h, out_h), jnp.float32)
        wx = jnp.asarray(_shrink_weights_np(w, out_w), jnp.float32)
        y = jnp.einsum("oh,...hw->...ow", wy, xf,
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("...ow,pw->...op", y, wx,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        sy0, sy1, fy = _zoom_taps_np(h, out_h)
        sx0, sx1, fx = _zoom_taps_np(w, out_w)
        fyj = jnp.asarray(fy, jnp.float32)[:, None]
        fxj = jnp.asarray(fx, jnp.float32)
        hp = (jnp.take(xf, jnp.asarray(sx0), axis=-1) * (1 - fxj)
              + jnp.take(xf, jnp.asarray(sx1), axis=-1) * fxj)
        y = (jnp.take(hp, jnp.asarray(sy0), axis=-2) * (1 - fyj)
             + jnp.take(hp, jnp.asarray(sy1), axis=-2) * fyj)

    return jnp.moveaxis(y, 0, -1) if chan else y
