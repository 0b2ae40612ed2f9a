"""Extraction-enhancement kernels: Gaussian/unsharp, CLAHE, non-local means.

The reference post-processes extracted watermarks with
NLM denoise → CLAHE(clip 2.0, 8×8 tiles) → unsharp mask
(ref: app_dct_svd_single.py:88-110,223,275-277). Here each stage is a
jit-safe XLA graph:

  - unsharp: separable 7×7 σ=1 Gaussian (cv2's auto kernel size for σ=1 on
    u8) + addWeighted, reflect-101 borders;
  - CLAHE: per-tile 256-bin histograms via one-hot matmul reductions,
    cv2-style clip/redistribute, per-tile LUTs, bilinear LUT interpolation —
    all batched over the 8×8 tile grid;
  - NLM: shift-based formulation — for every offset in the 21×21 search
    window a 7×7 box-filtered patch distance (computed with cumulative sums)
    and an exp weight; the whole thing is one fused elementwise reduction
    over 441 shifts. Matches cv2.fastNlMeansDenoising qualitatively (cv2
    uses LUT'd integral approximations; exact bit parity is not a goal —
    detection never sees these pixels).

All functions take/return uint8 and handle any leading batch dims.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dctsvd_tpu.ops import color as c_ops


# ---------------------------------------------------------------------------
# Gaussian + unsharp
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gauss1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(x: jax.Array, sigma: float = 1.0,
                  ksize: int | None = None) -> jax.Array:
    """cv2.GaussianBlur(x, (0,0), sigma) equivalent on float [..., H, W].

    cv2 auto-sizes the kernel as cvRound(sigma*3*2 + 1) | 1 for U8 inputs
    (createGaussianFilter: factor 3 for CV_8U, 4 for float depths) -> 7
    taps at sigma=1.0, 11 at sigma=1.5; cvRound is round-half-to-even
    like Python's round().  This module follows the U8 contract — the
    reference's enhancement chain blurs uint8 images
    (app_dct_svd_single.py:94-96) — so a float-input cv2 call only
    matches when passed this ksize explicitly.  The earlier
    round(sigma*3)*2+1 form agreed only at sigma=1.0 (9 vs cv2's 11 taps
    at sigma=1.5).  Reflect-101 borders.
    """
    if ksize is None:
        ksize = int(round(sigma * 6 + 1)) | 1
    k = jnp.asarray(_gauss1d(ksize, sigma), jnp.float32)
    pad = ksize // 2
    *lead, h, w = x.shape
    xp = jnp.pad(x.astype(jnp.float32),
                 [(0, 0)] * len(lead) + [(pad, pad), (pad, pad)],
                 mode="reflect")
    y = jnp.zeros_like(xp[..., pad:pad + h, :])
    for i in range(ksize):
        y = y + k[i] * xp[..., i:i + h, :]
    z = jnp.zeros(x.shape, jnp.float32)
    for i in range(ksize):
        z = z + k[i] * y[..., i:i + w]
    return z


def unsharp_u8(img_u8: jax.Array, amount: float, blur_weight: float,
               sigma: float = 1.0) -> jax.Array:
    """cv2.addWeighted(e, amount, GaussianBlur(e, σ), blur_weight, 0) with
    saturating round (ref: app_dct_svd_single.py:94-96,108-110)."""
    e = img_u8.astype(jnp.float32)
    blur = gaussian_blur(e, sigma)
    sharp = amount * e + blur_weight * blur
    # cvRound = round-half-to-even on x86/ARM; keep that tie behaviour
    return jnp.clip(jnp.round(sharp), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("tiles", "clip_limit"))
def clahe_u8(img_u8: jax.Array, tiles: int = 8,
             clip_limit: float = 2.0) -> jax.Array:
    """Contrast-limited adaptive histogram equalization on a u8 gray plane,
    following cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8)) semantics:
    reflect-101 pad to a tile multiple, per-tile clipped/redistributed
    histograms, per-tile LUT = round(cdf * 255 / tile_area), bilinear
    interpolation between the four surrounding tile LUTs.
    Leading batch dims map over the 2-D body (module contract).
    """
    if img_u8.ndim > 2:
        lead, hw = img_u8.shape[:-2], img_u8.shape[-2:]
        out = jax.vmap(lambda p: clahe_u8.__wrapped__(p, tiles, clip_limit))(
            img_u8.reshape((-1,) + hw))
        return out.reshape(lead + hw)
    h, w = img_u8.shape[-2], img_u8.shape[-1]
    th = -(-h // tiles)
    tw = -(-w // tiles)
    ph, pw = th * tiles - h, tw * tiles - w
    x = jnp.pad(img_u8, [(0, ph), (0, pw)], mode="reflect")

    # [tiles*tiles, th*tw] pixel values per tile
    t = x.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    t = t.reshape(tiles * tiles, th * tw)

    # histograms via one-hot matmul (256 bins)
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum(t[:, :, None] == bins[None, None, :], axis=1,
                   dtype=jnp.float32)                      # [T, 256]

    area = th * tw
    limit = jnp.maximum(jnp.floor(clip_limit * area / 256.0), 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit)
    # cv2's exact redistribution: excess//256 to every bin, then +1 to bins
    # 0, step, 2*step, ... (step = max(256//residual, 1)) until the residual
    # is used up. A uniform float spread looks close per-bin but drifts the
    # *cumulative* histogram by up to the residual (≤255 counts ≈ 63 gray
    # levels after LUT scaling), so the stepped form matters.
    batch = jnp.floor(excess / 256.0)
    resid = excess - batch * 256.0                       # [T, 1], < 256
    hist = hist + batch
    b = jnp.arange(256, dtype=jnp.float32)[None, :]
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(resid, 1.0)), 1.0)
    hit = (jnp.mod(b, step) == 0) & (jnp.floor(b / step) < resid)
    hist = hist + hit.astype(hist.dtype)

    cdf = jnp.cumsum(hist, axis=-1)
    lut = jnp.clip(jnp.round(cdf * (255.0 / area)), 0, 255)  # [T, 256]
    lut = lut.reshape(tiles, tiles, 256)

    # bilinear interpolation of the 4 neighbouring tile LUTs per pixel
    yy = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.arange(w, dtype=jnp.float32)
    ty = yy / th - 0.5
    tx = xx / tw - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(ty - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - x0, 0.0, 1.0)[None, :]

    v = img_u8.astype(jnp.int32)

    def pick(tyi, txi):
        # lut[tyi, txi, v] with broadcast gather
        flat = lut.reshape(tiles * tiles, 256)
        tid = tyi[:, None] * tiles + txi[None, :]
        return flat[tid, v]

    v00 = pick(y0, x0)
    v01 = pick(y0, x1)
    v10 = pick(y1, x0)
    v11 = pick(y1, x1)
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Non-local means
# ---------------------------------------------------------------------------

def _box_filter(x: jax.Array, r: int) -> jax.Array:
    """Mean over (2r+1)² windows with reflect-101 borders, via two cumsums."""
    k = 2 * r + 1
    *lead, h, w = x.shape
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(r, r), (r, r)], mode="reflect")
    c = jnp.cumsum(xp, axis=-2)
    c = jnp.pad(c, [(0, 0)] * len(lead) + [(1, 0), (0, 0)])
    rows = c[..., k:, :] - c[..., :-k, :]
    c2 = jnp.cumsum(rows, axis=-1)
    c2 = jnp.pad(c2, [(0, 0)] * len(lead) + [(0, 0), (1, 0)])
    return (c2[..., :, k:] - c2[..., :, :-k]) / (k * k)


@functools.partial(jax.jit, static_argnames=("h_param", "template", "search"))
def nlm_gray_u8(img_u8: jax.Array, h_param: float = 7.0,
                template: int = 7, search: int = 21) -> jax.Array:
    """Non-local means on a u8 gray plane (cv2.fastNlMeansDenoising
    parameter convention: h, templateWindowSize, searchWindowSize).

    Shift-based: weight(offset) = exp(-max(D−2σ², 0)/h²) with D the 7×7
    mean squared patch difference at that offset; σ=0 as in the reference
    call sites. 441 shifts, each a box filter + fused multiply-add.
    """
    x = img_u8.astype(jnp.float32)
    tr = template // 2
    sr = search // 2
    h2 = h_param * h_param

    *lead, hh, ww = x.shape
    pad = sr
    xp = jnp.pad(x, [(0, 0)] * len(lead) + [(pad, pad), (pad, pad)],
                 mode="reflect")

    offsets = [(dy, dx) for dy in range(-sr, sr + 1)
               for dx in range(-sr, sr + 1)]

    # static unroll is too large for 441 offsets; scan over stacked shifts
    dys = jnp.asarray([o[0] for o in offsets], jnp.int32)
    dxs = jnp.asarray([o[1] for o in offsets], jnp.int32)

    def body(acc, i):
        dy, dx = dys[i], dxs[i]
        shifted = jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(xp, pad + dy, hh, axis=-2),
            pad + dx, ww, axis=-1)
        d2 = _box_filter((x - shifted) ** 2, tr)
        wgt = jnp.exp(-d2 / h2)
        wsum, vsum = acc
        return (wsum + wgt, vsum + wgt * shifted), None

    init = (jnp.zeros(x.shape, jnp.float32), jnp.zeros(x.shape, jnp.float32))
    (wsum, vsum), _ = jax.lax.scan(body, init,
                                   jnp.arange(len(offsets), dtype=jnp.int32))
    out = vsum / jnp.maximum(wsum, 1e-12)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("h_luma", "h_chroma",
                                             "template", "search"))
def nlm_color_u8(img_bgr_u8: jax.Array, h_luma: float = 3.0,
                 h_chroma: float = 3.0, template: int = 7,
                 search: int = 21) -> jax.Array:
    """Colored NLM following cv2.fastNlMeansDenoisingColored's structure:
    luma/chroma split, NLM per plane (cv2 uses CIELAB; we use YCrCb, which
    the rest of the pipeline already speaks — a documented deviation that
    only affects enhancement cosmetics, not detection)."""
    ycc = c_ops.bgr_to_ycrcb(img_bgr_u8)
    y = nlm_gray_u8(ycc[..., 0], h_param=h_luma, template=template,
                    search=search)
    cr = nlm_gray_u8(ycc[..., 1], h_param=h_chroma, template=template,
                     search=search)
    cb = nlm_gray_u8(ycc[..., 2], h_param=h_chroma, template=template,
                     search=search)
    out = jnp.stack([y, cr, cb], axis=-1)
    return c_ops.ycrcb_to_bgr(out)
