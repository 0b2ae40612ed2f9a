import numpy as np

import oracle
from dctsvd_tpu.ops import permute
from dctsvd_tpu.utils import crypto


def test_key_derivation_matches_reference():
    nonce = b"\x01\x02\x03\x04\x05\x06\x07\x08"
    assert crypto.derive_key("pw", nonce) == oracle.derive_key("pw", nonce)


def test_permutation_bit_compat():
    nonce = bytes(range(8))
    key = crypto.derive_key("secret", nonce)
    ours = crypto.permutation_indices(key, 1000)
    ref = oracle.keyed_perm(key, 1000)
    np.testing.assert_array_equal(ours, ref)


def test_inverse_permutation():
    key = crypto.derive_key("x", b"12345678")
    idx = crypto.permutation_indices(key, 64 * 64)
    inv = crypto.inverse_permutation(idx)
    np.testing.assert_array_equal(idx[inv], np.arange(idx.size))


def test_device_permute_roundtrip(rng):
    key = crypto.derive_key("x", b"12345678")
    idx = crypto.permutation_indices(key, 32 * 48)
    inv = crypto.inverse_permutation(idx)
    img = rng.normal(size=(32, 48)).astype(np.float32)
    scr = permute.permute_plane(img, idx)
    # matches the reference's flat[idx] gather
    np.testing.assert_array_equal(
        np.asarray(scr), img.reshape(-1)[idx].reshape(32, 48))
    back = np.asarray(permute.unpermute_plane(scr, inv))
    np.testing.assert_array_equal(back, img)


def test_hmac_matches_reference(rng):
    key = crypto.derive_key("pw", b"abcdefgh")
    parts = [rng.normal(size=(16,)).astype(np.float32).tobytes(),
             rng.normal(size=(4, 4)).astype(np.float32).tobytes()]
    assert crypto.meta_digest(key, parts) == oracle.hmac_digest(key, parts)
    assert crypto.digests_equal(crypto.meta_digest(key, parts),
                                oracle.hmac_digest(key, parts))
