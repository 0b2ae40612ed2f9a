import cv2
import numpy as np

from dctsvd_tpu.ops import color


def test_bgr_to_ycrcb_bit_exact(rng):
    bgr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    ours = np.asarray(color.bgr_to_ycrcb(bgr))
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2YCrCb)
    np.testing.assert_array_equal(ours, ref)


def test_ycrcb_to_bgr_bit_exact(rng):
    ycc = rng.integers(0, 256, (64, 64, 3), np.uint8)
    ours = np.asarray(color.ycrcb_to_bgr(ycc))
    ref = cv2.cvtColor(ycc, cv2.COLOR_YCrCb2BGR)
    np.testing.assert_array_equal(ours, ref)


def test_bgr_to_gray_bit_exact(rng):
    bgr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    ours = np.asarray(color.bgr_to_gray(bgr))
    ref = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(ours, ref)


def test_luma_replace_roundtrip(rng):
    bgr = rng.integers(0, 256, (32, 48, 3), np.uint8)
    y = color.luma_f32(bgr)
    out = np.asarray(color.replace_luma(y, bgr))
    ycc = cv2.cvtColor(bgr, cv2.COLOR_BGR2YCrCb)
    ref = cv2.cvtColor(ycc, cv2.COLOR_YCrCb2BGR)
    np.testing.assert_array_equal(out, ref)


def test_batched(rng):
    bgr = rng.integers(0, 256, (4, 16, 16, 3), np.uint8)
    ours = np.asarray(color.bgr_to_ycrcb(bgr))
    for i in range(4):
        np.testing.assert_array_equal(
            ours[i], cv2.cvtColor(bgr[i], cv2.COLOR_BGR2YCrCb))
