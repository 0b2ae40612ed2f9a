"""Color conversions, bit-exact with OpenCV's fixed-point u8 paths.

The reference round-trips uint8 BGR ↔ YCrCb via cv2 (ref:
app_dct_svd_single.py:21-30) and converts watermarks BGR → gray (ref:
app_dct_svd_single.py:170). Those conversions quantize to uint8, and the
quantization feeds directly into the DCT, so parity within 0.1 dB requires
reproducing cv2's integer arithmetic exactly, not just the float formulas.

cv2's u8 kernels use fixed-point coefficients (verified bit-exact against
cv2 5.0 in tests/test_color.py):
  BGR→YCrCb (14-bit):  Y  = (R·4899 + G·9617 + B·1868 + 2^13) >> 14
                       Cr = ((R−Y)·11682 + 128·2^14 + 2^13) >> 14
                       Cb = ((B−Y)·9241  + 128·2^14 + 2^13) >> 14
  YCrCb→BGR (14-bit):  R = Y + ((Cr−128)·22987 + 2^13 >> 14), …
  BGR→GRAY  (15-bit):  g = (R·9798 + G·19235 + B·3735 + 2^14) >> 15

All functions are jit-safe and take/return channel-last uint8 arrays with any
leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _descale(x: jax.Array, shift: int) -> jax.Array:
    return (x + (1 << (shift - 1))) >> shift


def bgr_to_ycrcb(bgr_u8: jax.Array) -> jax.Array:
    """uint8 [..., 3] BGR -> uint8 [..., 3] YCrCb, bit-exact with cv2."""
    x = bgr_u8.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(r * 4899 + g * 9617 + b * 1868, 14)
    cr = _descale((r - y) * 11682 + (128 << 14), 14)
    cb = _descale((b - y) * 9241 + (128 << 14), 14)
    out = jnp.stack([y, cr, cb], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def ycrcb_to_bgr(ycc_u8: jax.Array) -> jax.Array:
    """uint8 [..., 3] YCrCb -> uint8 [..., 3] BGR, bit-exact with cv2."""
    x = ycc_u8.astype(jnp.int32)
    y, cr, cb = x[..., 0], x[..., 1] - 128, x[..., 2] - 128
    r = y + _descale(cr * 22987, 14)
    # cv2 folds the negative G coefficients into one descale; the arithmetic
    # right shift floors, so the sign must stay inside the shift to match.
    g = y + _descale(cr * -11698 + cb * -5636, 14)
    b = y + _descale(cb * 29049, 14)
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def bgr_to_gray(bgr_u8: jax.Array) -> jax.Array:
    """uint8 [..., 3] BGR -> uint8 [...] gray, bit-exact with cv2."""
    x = bgr_u8.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(r * 9798 + g * 19235 + b * 3735, 15)
    return jnp.clip(y, 0, 255).astype(jnp.uint8)


def luma_f32(bgr_u8: jax.Array) -> jax.Array:
    """The reference's `_to_Y`: quantized-u8 Y plane as float32
    (ref: app_dct_svd_single.py:21-24). Computes ONLY the Y channel —
    same fixed-point formula as bgr_to_ycrcb's first lane without the
    discarded Cr/Cb work (the full conversion measured 8.4 ms per 32
    1080p frames, ~15% of the gray serving path)."""
    x = bgr_u8.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = _descale(r * 4899 + g * 9617 + b * 1868, 14)
    return jnp.clip(y, 0, 255).astype(jnp.float32)


def replace_luma(y_f32: jax.Array, bgr_ref_u8: jax.Array) -> jax.Array:
    """The reference's `_from_Y`: clip Y to u8, recombine with the original
    Cr/Cb, convert back to BGR (ref: app_dct_svd_single.py:26-30)."""
    ycc = bgr_to_ycrcb(bgr_ref_u8)
    # The reference does np.clip(Yw, 0, 255).astype(np.uint8): truncation,
    # not rounding (ref: app_dct_svd_single.py:27). Match it.
    y = jnp.clip(y_f32, 0, 255).astype(jnp.uint8)
    ycc = ycc.at[..., 0].set(y)
    return ycrcb_to_bgr(ycc)
