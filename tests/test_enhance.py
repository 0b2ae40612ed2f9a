"""Enhancement-chain parity tests vs OpenCV (the reference's enhancement
backend, ref: app_dct_svd_single.py:88-110,223,275-277)."""

import cv2
import numpy as np

from dctsvd_tpu.models import enhance as m_enhance
from dctsvd_tpu.ops import enhance as e_ops


def _host(rng, shape=(128, 160)):
    return cv2.GaussianBlur(
        rng.integers(0, 256, shape, np.uint8), (0, 0), 2.0)


def test_gaussian_blur_matches_cv2(rng):
    img = _host(rng).astype(np.float32)
    ours = np.asarray(e_ops.gaussian_blur(img, 1.0))
    ref = cv2.GaussianBlur(img, (0, 0), 1.0)
    assert np.abs(ours - ref).max() < 0.05


def test_gaussian_blur_ksize_matches_cv2_across_sigmas(rng):
    """The auto kernel size must follow cv2's U8-input formula
    cvRound(sigma*6+1)|1, not round(sigma*3)*2+1 — the two agree only at
    sigma=1.0 (code-review r3: 9 vs cv2's 11 taps at sigma=1.5). cv2's
    FLOAT path uses factor 4, so the reference comparison pins the u8
    ksize explicitly."""
    img = _host(rng).astype(np.float32)
    for sigma in (0.8, 1.5, 2.0):
        k = int(round(sigma * 6 + 1)) | 1
        ours = np.asarray(e_ops.gaussian_blur(img, sigma))
        ref = cv2.GaussianBlur(img, (k, k), sigma)
        assert np.abs(ours - ref).max() < 0.05, sigma
        # and the u8 path (the reference chain's input type) auto-sizes
        # to exactly this kernel
        ref_u8 = cv2.GaussianBlur(img.astype(np.uint8), (0, 0), sigma)
        ref_u8_k = cv2.GaussianBlur(img.astype(np.uint8), (k, k), sigma)
        np.testing.assert_array_equal(ref_u8, ref_u8_k)


def test_clahe_batched_matches_per_plane(rng):
    """Leading batch dims map over the 2-D body (the module contract —
    clahe_u8 used to crash on any batched plane)."""
    import jax.numpy as jnp
    planes = np.stack([_host(rng, (64, 80)) for _ in range(3)])
    batched = np.asarray(e_ops.clahe_u8(jnp.asarray(planes)))
    for i in range(3):
        single = np.asarray(e_ops.clahe_u8(jnp.asarray(planes[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_unsharp_matches_cv2(rng):
    img = _host(rng)
    ours = np.asarray(e_ops.unsharp_u8(img, 1.25, -0.25))
    blur = cv2.GaussianBlur(img, (0, 0), 1.0)
    ref = np.clip(cv2.addWeighted(img, 1.25, blur, -0.25, 0), 0, 255)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_clahe_matches_cv2(rng):
    for shape, tiles in [((64, 64), 2), ((128, 160), 8), ((100, 90), 8)]:
        img = _host(rng, shape)
        ours = np.asarray(e_ops.clahe_u8(img, tiles=tiles))
        ref = cv2.createCLAHE(clipLimit=2.0,
                              tileGridSize=(tiles, tiles)).apply(img)
        d = np.abs(ours.astype(int) - ref.astype(int))
        assert d.max() <= 1, (shape, tiles, d.max())
        assert (d > 0).mean() < 0.01


def test_nlm_denoises_at_least_as_well_as_cv2(rng):
    clean = _host(rng)
    noisy = np.clip(clean.astype(int)
                    + rng.normal(0, 15, clean.shape), 0, 255).astype(np.uint8)
    ours = np.asarray(e_ops.nlm_gray_u8(noisy, 7.0))
    ref = cv2.fastNlMeansDenoising(noisy, None, 7, 7, 21)
    mse = lambda a: float(((a.astype(float) - clean) ** 2).mean())
    assert mse(ours) < mse(noisy)          # it denoises
    assert mse(ours) <= mse(ref) * 1.10    # competitive with cv2
    # and agrees with cv2's output closely on average
    assert np.abs(ours.astype(float) - ref.astype(float)).mean() < 1.0


def test_nlm_color_runs(rng):
    img = cv2.GaussianBlur(
        rng.integers(0, 256, (64, 64, 3), np.uint8), (0, 0), 2.0)
    out = np.asarray(e_ops.nlm_color_u8(img))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_enhance_chains(rng):
    gray = _host(rng, (96, 96))
    out = m_enhance.enhance_gray_np(gray)
    assert out.shape == gray.shape and out.dtype == np.uint8
    color = cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR)
    out_c = m_enhance.enhance_color_np(color)
    assert out_c.shape == color.shape

    # cv2-composed reference chains for comparison (same structure)
    ref = cv2.fastNlMeansDenoising(gray, None, 7, 7, 21)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(ref)
    blur = cv2.GaussianBlur(ref, (0, 0), 1.0)
    ref = np.clip(cv2.addWeighted(ref, 1.25, blur, -0.25, 0), 0, 255)
    # NLM seeds tiny differences that CLAHE can amplify locally; the chains
    # must still agree closely in the mean
    assert np.abs(out.astype(float) - ref.astype(float)).mean() < 4.0


def test_color_enhance_unsharp_is_spatial_per_channel(rng):
    """The color chain's unsharp must blur spatially per channel like
    cv2 — it used to feed [H, W, 3] straight into gaussian_blur, which
    convolves the last two axes (a 7-tap kernel ACROSS B/G/R, no
    vertical blur at all; code-review r3). Denoise off isolates
    CLAHE-on-Y + unsharp, both cv2-composable."""
    import jax.numpy as jnp
    rgb = np.stack([_host(rng, (96, 96)), _host(rng, (96, 96)),
                    _host(rng, (96, 96))], axis=-1)
    out = np.asarray(m_enhance.enhance_color_u8(jnp.asarray(rgb),
                                                denoise=False))
    ycc = cv2.cvtColor(rgb, cv2.COLOR_BGR2YCrCb)
    ycc[..., 0] = cv2.createCLAHE(
        clipLimit=2.0, tileGridSize=(8, 8)).apply(ycc[..., 0])
    ref = cv2.cvtColor(ycc, cv2.COLOR_YCrCb2BGR)
    blur = cv2.GaussianBlur(ref, (0, 0), 1.0)
    ref = np.clip(cv2.addWeighted(ref, 1.15, blur, -0.15, 0), 0, 255)
    d = np.abs(out.astype(float) - ref.astype(float))
    # CLAHE/LUT edges differ by <=1 before the +-0.15-weighted blur;
    # cross-channel bleeding (the old bug) produced mean diffs > 2
    assert d.mean() < 0.5 and d.max() <= 6, (d.mean(), d.max())
