"""Host-side key derivation, keyed permutation indices, and meta HMAC.

Byte-for-byte compatible with the reference security layer
(ref: app_dct_svd_single.py:59-86,119,152-156,182): key = SHA-256(password ‖
nonce); the keyed RNG is NumPy PCG64 seeded from the first 8 key bytes
(big-endian); the permutation is an in-place Fisher–Yates shuffle of
``arange(H*W)`` by that RNG; the meta digest is HMAC-SHA256 over the raw bytes
of the stored arrays in a fixed order.

All of this stays on host (hashlib/NumPy): SHA-256/HMAC are not accelerator
work, and bit-exact NumPy-PCG64 shuffle compatibility is required so that
metas embed/extract across implementations. The resulting index array is the
only thing shipped to the device, where (un)permutation is a gather.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import os
from typing import Iterable, Optional

import numpy as np


NONCE_BYTES = 8


def make_nonce() -> bytes:
    return os.urandom(NONCE_BYTES)


def derive_key(password: str, nonce: bytes) -> bytes:
    """SHA-256(password_utf8 ‖ nonce) (ref: app_dct_svd_single.py:59-60)."""
    return hashlib.sha256(password.encode("utf-8") + nonce).digest()


def rng_from_key(key: bytes) -> np.random.Generator:
    """PCG64 seeded from the first 8 key bytes, big-endian
    (ref: app_dct_svd_single.py:62-64)."""
    seed = int.from_bytes(key[:8], "big", signed=False)
    return np.random.default_rng(seed)


def permutation_indices(key: bytes, n: int) -> np.ndarray:
    """The keyed flat-index shuffle both embed and extract re-derive
    (ref: app_dct_svd_single.py:66-72,219). Returns int idx with
    ``scrambled_flat = flat[idx]``."""
    idx = np.arange(n)
    rng_from_key(key).shuffle(idx)
    return idx


def block_permutation_indices(key: bytes, n_blocks: int,
                              block_elems: int = 64):
    """Keyed permutation pair for the blocked (8×8) scheme: a shuffle of the
    ``n_blocks`` block slots plus one shared shuffle of the ``block_elems``
    pixels inside every block. Drawn from the same PCG64 stream as the
    reference's plane shuffle (block order first, then intra order), so both
    are re-derivable from (password, nonce) alone — nothing extra persists
    in the meta. Returns ``(blk_idx, intra_idx)`` with
    ``permuted[i] = natural[blk_idx[i]]``.
    """
    rng = rng_from_key(key)
    blk = np.arange(n_blocks)
    rng.shuffle(blk)
    intra = np.arange(block_elems)
    rng.shuffle(intra)
    return blk, intra


def inverse_permutation(idx: np.ndarray) -> np.ndarray:
    """inv such that ``flat = scrambled_flat[inv]``
    (ref: app_dct_svd_single.py:74-80 builds inv[idx]=arange and gathers by
    inv — equivalently inv = argsort(idx), done here without the sort)."""
    inv = np.empty_like(idx)
    inv[idx] = np.arange(idx.size)
    return inv


def meta_digest(key: bytes, parts: Iterable[bytes]) -> bytes:
    """HMAC-SHA256 over concatenated raw array bytes
    (ref: app_dct_svd_single.py:82-86)."""
    h = _hmac.new(key, b"", hashlib.sha256)
    for p in parts:
        h.update(p)
    return h.digest()


def digests_equal(a: bytes, b: bytes) -> bool:
    return _hmac.compare_digest(a, b)


def require_password(password: Optional[str]) -> str:
    if not password:
        raise ValueError("A password is required for embed/extract.")
    return password
