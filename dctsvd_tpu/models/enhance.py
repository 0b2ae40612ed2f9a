"""The extraction enhancement chain, mirroring the reference's composition.

Gray:  NLM(h=7,7,21) → CLAHE(2.0, 8×8) → unsharp(1.25, −0.25, σ=1)
       (ref: app_dct_svd_single.py:88-96,223,227)
Color: colored NLM(3,3,7,21) → CLAHE on Y only → unsharp(1.15, −0.15, σ=1)
       (ref: app_dct_svd_single.py:98-110,275-277)

The reference wraps NLM and CLAHE in try/except and silently continues on
failure (ref: :89-93,223-224,275-276); we keep that graceful-degradation
contract at this layer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dctsvd_tpu.utils.xfer import to_numpy

from dctsvd_tpu.ops import color as c_ops
from dctsvd_tpu.ops import enhance as e_ops


@functools.partial(jax.jit, static_argnames=("denoise",))
def enhance_gray_u8(x: jax.Array, denoise: bool = True) -> jax.Array:
    """Whole gray chain as ONE graph (one compile, one dispatch)."""
    if denoise:
        x = e_ops.nlm_gray_u8.__wrapped__(x, h_param=7.0, template=7,
                                          search=21)
    x = e_ops.clahe_u8.__wrapped__(x, tiles=8, clip_limit=2.0)
    return e_ops.unsharp_u8(x, 1.25, -0.25, sigma=1.0)


@functools.partial(jax.jit, static_argnames=("denoise",))
def enhance_color_u8(x: jax.Array, denoise: bool = True) -> jax.Array:
    """Whole color chain as ONE graph."""
    if denoise:
        x = e_ops.nlm_color_u8.__wrapped__(x, h_luma=3.0, h_chroma=3.0,
                                           template=7, search=21)
    ycc = c_ops.bgr_to_ycrcb(x)
    y = e_ops.clahe_u8.__wrapped__(ycc[..., 0], tiles=8, clip_limit=2.0)
    x = c_ops.ycrcb_to_bgr(ycc.at[..., 0].set(y))
    # channel-FIRST for the unsharp: gaussian_blur convolves the last two
    # axes, so feeding [H, W, 3] directly blurred width x CHANNELS (a
    # 7-tap kernel across B/G/R) and never blurred vertically
    x = jnp.moveaxis(x, -1, -3)
    x = e_ops.unsharp_u8(x, 1.15, -0.15, sigma=1.0)
    return jnp.moveaxis(x, -3, -1)


def enhance_gray_np(img_u8: np.ndarray, denoise: bool = True) -> np.ndarray:
    x = jnp.asarray(img_u8)
    try:
        return to_numpy(enhance_gray_u8(x, denoise=denoise))
    except Exception:
        # graceful degradation like the reference's try/except around
        # NLM/CLAHE (ref: app_dct_svd_single.py:89-93,223-224): fall back to
        # the unsharp-only tail rather than failing the extraction.
        return to_numpy(e_ops.unsharp_u8(x, 1.25, -0.25, sigma=1.0))


def enhance_color_np(img_bgr_u8: np.ndarray,
                     denoise: bool = True) -> np.ndarray:
    x = jnp.asarray(img_bgr_u8)
    try:
        return to_numpy(enhance_color_u8(x, denoise=denoise))
    except Exception:
        x = jnp.moveaxis(x, -1, -3)        # channel-first (see above)
        sharp = e_ops.unsharp_u8(x, 1.15, -0.15, sigma=1.0)
        return to_numpy(jnp.moveaxis(sharp, -3, -1))
