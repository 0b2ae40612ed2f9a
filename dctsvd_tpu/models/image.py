"""Image watermark pipelines (parity path): jit-compiled embed/extract/detect.

Array-in/array-out device graphs reproducing the reference's secure image
core (ref: app_dct_svd_single.py:112-318) — whole-frame DCT + full SVD,
additive spread on the top-K singular values, keyed permutation as a device
gather. Host concerns (file IO, password→key, HMAC, npz) live in
``dctsvd_tpu.api`` / ``dctsvd_tpu.io.meta``.

Shapes are static per jit cache entry (H, W, kfrac bake K at trace time);
``alpha`` stays a traced scalar so alpha sweeps don't recompile. All graphs
accept leading batch dims on the image inputs via vmap in callers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import color, dct, metrics, permute, svd
from dctsvd_tpu.utils.config import K_FRAC_DEFAULT


def k_of(length: int, kfrac: float) -> int:
    """K = max(8, int(kfrac · L)) (ref: app_dct_svd_single.py:174)."""
    return max(8, int(kfrac * length))


class GrayEmbedResult(NamedTuple):
    stego_bgr: jax.Array   # [H, W, 3] u8
    y_marked: jax.Array    # [H, W] f32, pre-clip (feeds the reference's SSIM)
    sc: jax.Array          # [L] cover singular values
    uw: jax.Array          # [L, L] watermark left basis (DCT domain)
    vwt: jax.Array         # [L, L] watermark right basis
    sw: jax.Array          # [L] watermark singular values
    psnr: jax.Array
    ssim: jax.Array


class ColorEmbedResult(NamedTuple):
    stego_bgr: jax.Array   # [H, W, 3] u8
    s_cover: jax.Array     # [3, L] per-channel cover singular values (B,G,R)
    uw: jax.Array          # [3, L, L]
    vwt: jax.Array         # [3, L, L]
    sw: jax.Array          # [3, L]
    psnr: jax.Array
    ssim: jax.Array


def _spread(s_cover: jax.Array, s_wm: jax.Array, alpha: jax.Array,
            k: int) -> jax.Array:
    """S'[i] = S[i] + α·Sw[i] for i < K, else S[i]
    (ref: app_dct_svd_single.py:174-175)."""
    l = s_cover.shape[-1]
    mask = (jnp.arange(l) < k).astype(s_cover.dtype)
    return s_cover + alpha * mask * s_wm


@functools.partial(jax.jit, static_argnames=("kfrac",))
def embed_gray(cover_bgr_u8: jax.Array, wm_gray_u8: jax.Array,
               perm_idx: jax.Array, alpha: jax.Array,
               kfrac: float = K_FRAC_DEFAULT) -> GrayEmbedResult:
    """Gray (Y-channel) embed (ref: app_dct_svd_single.py:168-190).

    ``wm_gray_u8`` must already be resized to the cover's H×W (callers use
    ops.resize.resize_area_u8 + ops.color.bgr_to_gray, matching the
    reference's INTER_AREA + BGR2GRAY preprocessing).
    """
    h, w = cover_bgr_u8.shape[-3], cover_bgr_u8.shape[-2]
    y = color.luma_f32(cover_bgr_u8)
    wy = wm_gray_u8.astype(jnp.float32)
    wy_s = permute.permute_plane(wy, perm_idx)

    c = dct.dct2(y)
    uc, sc, vct = svd.svd_full(c)
    wm_c = dct.dct2(wy_s)
    uw, sw, vwt = svd.svd_full(wm_c)

    l = min(h, w)
    k = k_of(l, kfrac)
    s_marked = _spread(sc, sw, alpha, k)
    cw = jnp.einsum("ij,j,jk->ik", uc, s_marked, vct,
                    precision=jax.lax.Precision.HIGHEST)
    y_marked = dct.idct2(cw)
    stego = color.replace_luma(y_marked, cover_bgr_u8)

    ps = metrics.psnr(cover_bgr_u8, stego)
    gray_cover = color.bgr_to_gray(cover_bgr_u8)
    ss = metrics.ssim(gray_cover, y_marked)
    return GrayEmbedResult(stego, y_marked, sc, uw, vwt, sw, ps, ss)


@functools.partial(jax.jit, static_argnames=("kfrac",))
def embed_color(cover_bgr_u8: jax.Array, wm_bgr_u8: jax.Array,
                perm_idx: jax.Array, alpha: jax.Array,
                kfrac: float = K_FRAC_DEFAULT) -> ColorEmbedResult:
    """Per-BGR-channel embed with one shared permutation
    (ref: app_dct_svd_single.py:121-167)."""
    h, w = cover_bgr_u8.shape[-3], cover_bgr_u8.shape[-2]
    chans = jnp.moveaxis(cover_bgr_u8.astype(jnp.float32), -1, 0)  # [3,H,W]
    wm_chans = jnp.moveaxis(wm_bgr_u8.astype(jnp.float32), -1, 0)
    wm_s = permute.permute_plane(wm_chans, perm_idx)

    c = dct.dct2(chans)                     # [3, H, W]
    uc, sc, vct = svd.svd_full(c)           # batched over 3 channels
    wc = dct.dct2(wm_s)
    uw, sw, vwt = svd.svd_full(wc)

    l = min(h, w)
    k = k_of(l, kfrac)
    s_marked = _spread(sc, sw, alpha, k)
    cw = jnp.einsum("cij,cj,cjk->cik", uc, s_marked, vct,
                    precision=jax.lax.Precision.HIGHEST)
    marked = dct.idct2(cw)
    stego = jnp.clip(marked, 0, 255).astype(jnp.uint8)
    stego = jnp.moveaxis(stego, 0, -1)      # [H, W, 3]

    ps = metrics.psnr(cover_bgr_u8, stego)
    ss = metrics.ssim(color.bgr_to_gray(cover_bgr_u8),
                      color.bgr_to_gray(stego))
    return ColorEmbedResult(stego, sc, uw, vwt, sw, ps, ss)


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "shape"))
def extract_gray(stego_bgr_u8: jax.Array, sc: jax.Array, uw: jax.Array,
                 vwt: jax.Array, inv_idx: jax.Array, alpha: jax.Array,
                 kfrac: float = K_FRAC_DEFAULT,
                 normalize: bool = True, shape=None) -> jax.Array:
    """Gray extract up to the u8 watermark plane, pre-enhancement
    (ref: app_dct_svd_single.py:203-222). NLM/CLAHE/unsharp are applied by
    the caller (models.enhance) to mirror the reference's try/except
    graceful-degradation contract.

    ``shape`` is the meta's recorded (H, W): the watermark canvas and the
    unpermute are sized from it, so a stego that was resized relative to
    the meta still extracts (the reference sizes Wm_full and the
    permutation from the meta's H, W — ref: app_dct_svd_single.py:210-220).
    Defaults to the stego's own shape.
    """
    h, w = shape or (stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2])
    y = color.luma_f32(stego_bgr_u8)
    cw = dct.dct2(y)
    s_cw = svd.svd_full(cw, compute_uv=False)

    l = min(int(sc.shape[-1]), int(s_cw.shape[-1]),
            int(uw.shape[-2]), int(vwt.shape[-2]))
    k = k_of(l, kfrac)
    alpha_safe = jnp.maximum(alpha, 1e-8)
    sw_hat = (s_cw[:l] - sc[:l]) / alpha_safe
    sw_hat = jnp.where(jnp.arange(l) < k, sw_hat, 0.0)

    wm_hat = jnp.einsum("ij,j,jk->ik", uw[:l, :l], sw_hat, vwt[:l, :l],
                        precision=jax.lax.Precision.HIGHEST)
    wm_full = jnp.zeros((h, w), jnp.float32).at[:l, :l].set(
        wm_hat[: min(l, h), : min(l, w)])
    wy_s = dct.idct2(wm_full)
    wy = permute.unpermute_plane(wy_s, inv_idx)
    if normalize:
        wy = _minmax_255(wy)
    return jnp.clip(wy, 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit,
                   static_argnames=("kfrac", "normalize", "shape"))
def extract_color(stego_bgr_u8: jax.Array, s_cover: jax.Array, uw: jax.Array,
                  vwt: jax.Array, inv_idx: jax.Array, alpha: jax.Array,
                  kfrac: float = K_FRAC_DEFAULT,
                  normalize: bool = True, shape=None) -> jax.Array:
    """Color extract, pre-enhancement (ref: app_dct_svd_single.py:232-274).
    ``shape`` = meta's recorded (H, W), see :func:`extract_gray`."""
    h, w = shape or (stego_bgr_u8.shape[-3], stego_bgr_u8.shape[-2])
    chans = jnp.moveaxis(stego_bgr_u8.astype(jnp.float32), -1, 0)
    c = dct.dct2(chans)
    s_cw = svd.svd_full(c, compute_uv=False)      # [3, L]

    l = min(int(s_cover.shape[-1]), int(s_cw.shape[-1]),
            int(uw.shape[-2]), int(vwt.shape[-2]))
    k = k_of(l, kfrac)
    alpha_safe = jnp.maximum(alpha, 1e-8)
    sw_hat = (s_cw[:, :l] - s_cover[:, :l]) / alpha_safe
    sw_hat = jnp.where(jnp.arange(l)[None, :] < k, sw_hat, 0.0)

    wm_hat = jnp.einsum("cij,cj,cjk->cik", uw[:, :l, :l], sw_hat,
                        vwt[:, :l, :l], precision=jax.lax.Precision.HIGHEST)
    wm_full = jnp.zeros((3, h, w), jnp.float32).at[:, :l, :l].set(
        wm_hat[:, : min(l, h), : min(l, w)])
    wm_s = dct.idct2(wm_full)
    wm = permute.unpermute_plane(wm_s, inv_idx)
    if normalize:
        wm = jax.vmap(_minmax_255)(wm)
    out = jnp.clip(wm, 0, 255).astype(jnp.uint8)
    return jnp.moveaxis(out, 0, -1)


def _minmax_255(x: jax.Array) -> jax.Array:
    """cv2.normalize(..., 0, 255, NORM_MINMAX) equivalent."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
    return (x - lo) * scale


@jax.jit
def detect_gray(stego_bgr_u8: jax.Array, sc: jax.Array,
                sw: jax.Array, alpha: jax.Array) -> jax.Array:
    """No-password NC detect score (ref: app_dct_svd_single.py:291-302).

    Note no kfrac truncation happens in detect — the full Ŝw is correlated.
    """
    y = color.luma_f32(stego_bgr_u8)
    s_cw = svd.svd_full(dct.dct2(y), compute_uv=False)
    l = min(int(sc.shape[-1]), int(s_cw.shape[-1]), int(sw.shape[-1]))
    sw_hat = (s_cw[:l] - sc[:l]) / jnp.maximum(alpha, 1e-8)
    return metrics.nc(sw[:l], sw_hat)


@jax.jit
def detect_color(stego_bgr_u8: jax.Array, s_cover: jax.Array,
                 sw: jax.Array, alpha: jax.Array) -> jax.Array:
    """Mean of per-channel NC scores (ref: app_dct_svd_single.py:303-318)."""
    chans = jnp.moveaxis(stego_bgr_u8.astype(jnp.float32), -1, 0)
    s_cw = svd.svd_full(dct.dct2(chans), compute_uv=False)
    l = min(int(s_cover.shape[-1]), int(s_cw.shape[-1]), int(sw.shape[-1]))
    sw_hat = (s_cw[:, :l] - s_cover[:, :l]) / jnp.maximum(alpha, 1e-8)
    return jnp.mean(metrics.nc(sw[:, :l], sw_hat))
