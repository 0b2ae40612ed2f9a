"""Orthonormal 2-D DCT-II/III as MXU matmuls.

The reference computes a single whole-frame ``cv2.dct`` on the full H×W
float32 plane (ref: app_dct_svd_single.py:32-36). On TPU the DCT is two
matmuls against precomputed orthonormal basis matrices —
``dct2(X) = D_H · X · D_Wᵀ`` — which is ideal systolic-array work and lets
XLA fuse neighbouring elementwise stages into the same loop nest. Works for
any (odd or even) H, W, like cv2's implementation.

The blocked throughput path uses the same matrices at n=8, batched over
``[..., N, 8, 8]`` block tensors with a single einsum so the whole frame's
block DCT is one fused contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _dct_matrix_np(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis: D[k, j] = s_k * cos(pi*(2j+1)*k / (2n)).

    Built in float64 on host and cast once, so the f32 basis carries full
    precision. D is orthogonal: D @ D.T = I.
    """
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    d = np.cos(np.pi * (2 * j + 1) * k / (2 * n))
    d *= np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


def dct_matrix(n: int, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(_dct_matrix_np(n), dtype=dtype)


def dct2(x: jax.Array, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Whole-plane 2-D DCT-II of the trailing two axes (any leading batch).

    Equivalent to cv2.dct on each plane (ref: app_dct_svd_single.py:32-33).
    """
    h, w = x.shape[-2], x.shape[-1]
    dh = dct_matrix(h, x.dtype)
    dw = dct_matrix(w, x.dtype)
    y = jnp.einsum("kh,...hw->...kw", dh, x, precision=precision)
    return jnp.einsum("...kw,lw->...kl", y, dw, precision=precision)


def idct2(x: jax.Array, precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Inverse (DCT-III) of :func:`dct2` (ref: app_dct_svd_single.py:35-36)."""
    h, w = x.shape[-2], x.shape[-1]
    dh = dct_matrix(h, x.dtype)
    dw = dct_matrix(w, x.dtype)
    y = jnp.einsum("kh,...kl->...hl", dh, x, precision=precision)
    return jnp.einsum("...hl,lw->...hw", y, dw, precision=precision)


# ---------------------------------------------------------------------------
# Blocked (8×8) form — throughput path
# ---------------------------------------------------------------------------

def blockify(x: jax.Array, b: int = 8) -> jax.Array:
    """[..., H, W] -> [..., H//b * W//b, b, b] row-major block tensor.

    H and W must be multiples of b (callers pad first; see models/blocked.py).
    """
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // b, b, w // b, b)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, (h // b) * (w // b), b, b)


def unblockify(blocks: jax.Array, h: int, w: int, b: int = 8) -> jax.Array:
    """Inverse of :func:`blockify`."""
    *lead, _, _, _ = blocks.shape
    x = blocks.reshape(*lead, h // b, w // b, b, b)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, h, w)


def dct2_blocks(blocks: jax.Array,
                precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Batched b×b DCT over a [..., N, b, b] block tensor."""
    b = blocks.shape[-1]
    d = dct_matrix(b, blocks.dtype)
    return jnp.einsum("ki,...nij,lj->...nkl", d, blocks, d,
                      precision=precision)


# ---------------------------------------------------------------------------
# View-based forms: block DCT straight off the [..., H, W] plane.
#
# blockify()'s swapaxes is a strided HBM transpose of the whole tensor
# (~100 MB per 1080p batch-8 channel stack) and showed up as one of the
# hottest ops on hardware. These forms instead reshape the plane to the FREE
# view [..., H/b, b, W/b, b] (pure dim splits, no data movement) and let a
# single einsum against the Kronecker DCT tensor produce block-major output —
# the layout change rides the matmul epilogue instead of a separate pass.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _dct_kron_np(b: int) -> np.ndarray:
    """F[k, l, i, j] = D[k, i] · D[l, j] (f64 host build)."""
    d = _dct_matrix_np(b)
    return np.einsum("ki,lj->klij", d, d)


def dct2_plane_blocks(x: jax.Array, b: int = 8,
                      precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """[..., H, W] plane -> [..., N, b, b] block-DCT coefficients.

    Equivalent to ``dct2_blocks(blockify(x))`` without materializing the
    blockify transpose. H, W must be multiples of b (callers pad first).
    """
    *lead, h, w = x.shape
    v = x.reshape(*lead, h // b, b, w // b, b)
    f = jnp.asarray(_dct_kron_np(b), x.dtype)
    out = jnp.einsum("...hiwj,klij->...hwkl", v, f, precision=precision)
    return out.reshape(*lead, (h // b) * (w // b), b, b)


def idct2_blocks_to_plane(blocks: jax.Array, h: int, w: int, b: int = 8,
                          row_perm: jax.Array | None = None,
                          precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """[..., N, b, b] coefficient blocks -> [..., H, W] spatial plane.

    Equivalent to ``unblockify(idct2_blocks(blocks))`` in one einsum. When
    ``row_perm`` (an int array of b·b flat pixel indices) is given, the
    per-block spatial output is additionally permuted by it — this folds the
    blocked scheme's shared intra-block unshuffle into the inverse-DCT
    matmul for free (pixel p of the output block = plain-IDCT pixel
    row_perm[p]).
    """
    *lead, n, _, _ = blocks.shape
    v = blocks.reshape(*lead, h // b, w // b, b, b)
    # T[p=(i,j), q=(a,c)] = D[a,i]·D[c,j]  (y = Dᵀ X D)
    t = jnp.asarray(_dct_kron_np(b).transpose(2, 3, 0, 1), blocks.dtype)
    t = t.reshape(b * b, b * b)
    if row_perm is not None:
        t = jnp.take(t, row_perm, axis=0)
    t = t.reshape(b, b, b, b)
    out = jnp.einsum("...hwac,ijac->...hiwj", v, t, precision=precision)
    return out.reshape(*lead, h, w)


def idct_pixel_tensor(b: int = 8, row_perm: jax.Array | None = None,
                      dtype=jnp.float32) -> jax.Array:
    """T[i, j, a, c] with IDCT_block[i, j] = Σ T[i,j,a,c]·coef[a,c], the
    same tensor :func:`idct2_blocks_to_plane` contracts against, with the
    optional intra-block unshuffle folded in. Used to precompute the
    pixel-domain per-component watermark basis (models/blocked.py
    prepare_extract_basis)."""
    t = jnp.asarray(_dct_kron_np(b).transpose(2, 3, 0, 1), dtype)
    t = t.reshape(b * b, b * b)
    if row_perm is not None:
        t = jnp.take(t, row_perm, axis=0)
    return t.reshape(b, b, b, b)


def idct2_blocks(blocks: jax.Array,
                 precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    b = blocks.shape[-1]
    d = dct_matrix(b, blocks.dtype)
    return jnp.einsum("ik,...nij,jl->...nkl", d, blocks, d,
                      precision=precision)
