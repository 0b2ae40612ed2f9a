import cv2
import numpy as np
import scipy.fft

from dctsvd_tpu.ops import dct


def test_dct2_matches_scipy(rng):
    for h, w in [(64, 64), (63, 97), (128, 256)]:
        x = rng.normal(size=(h, w)).astype(np.float32)
        ours = np.asarray(dct.dct2(x))
        ref = scipy.fft.dctn(x.astype(np.float64), norm="ortho")
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_dct2_matches_cv2(rng):
    x = (rng.random((96, 160)) * 255).astype(np.float32)
    ours = np.asarray(dct.dct2(x))
    ref = cv2.dct(x)
    assert np.max(np.abs(ours - ref)) < 5e-2  # both f32; scale ~1e4 coeffs


def test_roundtrip(rng):
    x = (rng.random((100, 70)) * 255).astype(np.float32)
    back = np.asarray(dct.idct2(dct.dct2(x)))
    np.testing.assert_allclose(back, x, atol=1e-2)


def test_blockify_roundtrip(rng):
    x = rng.normal(size=(2, 64, 80)).astype(np.float32)
    blocks = dct.blockify(x)
    assert blocks.shape == (2, 80, 8, 8)
    back = np.asarray(dct.unblockify(blocks, 64, 80))
    np.testing.assert_array_equal(back, x)
    # first block is the top-left 8x8 tile
    np.testing.assert_array_equal(np.asarray(blocks)[0, 0], x[0, :8, :8])


def test_blocked_dct_matches_per_block(rng):
    x = rng.normal(size=(32, 8, 8)).astype(np.float32)
    ours = np.asarray(dct.dct2_blocks(x))
    for i in range(32):
        ref = scipy.fft.dctn(x[i].astype(np.float64), norm="ortho")
        np.testing.assert_allclose(ours[i], ref, atol=1e-4)
    back = np.asarray(dct.idct2_blocks(ours))
    np.testing.assert_allclose(back, x, atol=1e-4)
