"""Quality metrics (PSNR / SSIM / NC), jit-safe and batchable on device.

Mirrors the reference's inline metrics exactly:
  - psnr: 20·log10(255/max(√mse, 1e-12)), capped at 99.0 for mse ≤ 1e-12
    (ref: app_dct_svd_single.py:38-42)
  - ssim: simplified luminance SSIM over 11×11 σ=1.5 Gaussian windows,
    C1=(0.01·255)², C2=(0.03·255)², +1e-12 in the denominator
    (ref: app_dct_svd_single.py:44-57); cv2.GaussianBlur uses reflect-101
    borders and a float64 kernel — reproduced here as a separable conv.
  - nc: zero-mean cosine similarity with +1e-8 in the denominator
    (ref: app_dct_svd_single.py:284-289)

These double as the framework's north-star observability metrics; all accept
leading batch dims and are shard_map-friendly (pure elementwise + reductions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array,
         image_ndim: int | None = None) -> jax.Array:
    """Per-image PSNR over leading batch dims (the module contract —
    pooling the whole batch into one scalar averaged bad frames away and
    made the with_metrics result shape diverge from ssim's).

    ``image_ndim``: trailing axes forming ONE image. Default: 3 when the
    trailing dim looks like a channel axis (<= 4 on a >= 3-D input,
    matching ops/resize's documented heuristic), else 2 — pass it
    explicitly for shapes the heuristic cannot distinguish
    (e.g. a [B, H, 4] plane batch)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if image_ndim is None:
        image_ndim = 3 if (a.ndim >= 3 and a.shape[-1] <= 4) else 2
    axes = tuple(range(a.ndim - min(image_ndim, a.ndim), a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=axes)
    val = 20.0 * jnp.log10(255.0 / jnp.maximum(jnp.sqrt(mse), 1e-12))
    return jnp.where(mse <= 1e-12, jnp.float32(99.0), val)


def _gaussian_blur(x: jax.Array, ksize: int = 11,
                   sigma: float = 1.5) -> jax.Array:
    """SSIM's 11x11 sigma=1.5 window — ops/enhance.gaussian_blur with the
    size pinned (one blur implementation to keep cv2-matched, not two)."""
    from dctsvd_tpu.ops import enhance as e_ops
    return e_ops.gaussian_blur(x, sigma=sigma, ksize=ksize)


def ssim(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Simplified single-scale SSIM on gray float32 planes [..., H, W]."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1 = _gaussian_blur(x)
    mu2 = _gaussian_blur(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _gaussian_blur(x * x) - mu1_sq
    s2 = _gaussian_blur(y * y) - mu2_sq
    s12 = _gaussian_blur(x * y) - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2) + 1e-12
    return jnp.mean(num / den, axis=(-2, -1))


def nc(a: jax.Array, b: jax.Array) -> jax.Array:
    """Zero-mean normalized correlation along the last axis."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a = a - jnp.mean(a, axis=-1, keepdims=True)
    b = b - jnp.mean(b, axis=-1, keepdims=True)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
    return jnp.sum(a * b, axis=-1) / den
