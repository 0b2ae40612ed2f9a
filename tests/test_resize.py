import cv2
import numpy as np

from dctsvd_tpu.ops import resize


def test_upscale_matches_cv2(rng):
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 512, 512))
    ref = cv2.resize(img, (512, 512), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


def test_integer_shrink_matches_cv2(rng):
    img = rng.integers(0, 256, (512, 256, 3), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 64, 64))
    ref = cv2.resize(img, (64, 64), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


def test_general_shrink_close_to_cv2(rng):
    img = rng.integers(0, 256, (100, 90, 3), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 41, 37))
    ref = cv2.resize(img, (37, 41), interpolation=cv2.INTER_AREA)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_mixed_axes_bit_exact(rng):
    # upscale one axis, shrink the other -> cv2 zoom path on both axes
    img = rng.integers(0, 256, (64, 200, 3), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 128, 50))
    ref = cv2.resize(img, (50, 128), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


def test_noninteger_upscale_bit_exact(rng):
    img = rng.integers(0, 256, (64, 48), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 200, 300))
    ref = cv2.resize(img, (300, 200), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


def test_gray_plane(rng):
    img = rng.integers(0, 256, (64, 64), np.uint8)
    ours = np.asarray(resize.resize_area_u8(img, 512, 384))
    ref = cv2.resize(img, (384, 512), interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(ours, ref)


def test_float_variant_close(rng):
    img = rng.integers(0, 256, (64, 48), np.uint8)
    a = np.asarray(resize.resize_area(img.astype(np.float32), 512, 512))
    b = cv2.resize(img, (512, 512), interpolation=cv2.INTER_AREA)
    assert np.abs(a - b.astype(np.float32)).max() <= 1.0
