import numpy as np

import oracle
from dctsvd_tpu.ops import metrics


def test_psnr_matches(rng):
    a = rng.integers(0, 256, (64, 64, 3), np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-5, 6, a.shape), 0, 255
                ).astype(np.uint8)
    assert abs(float(metrics.psnr(a, b)) - oracle.psnr(a, b)) < 1e-3
    assert float(metrics.psnr(a, a)) == 99.0


def test_ssim_matches(rng):
    a = rng.integers(0, 256, (96, 96), np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 21, a.shape), 0, 255
                ).astype(np.uint8)
    ours = float(metrics.ssim(a, b))
    ref = oracle.ssim(a, b)
    assert abs(ours - ref) < 1e-3


def test_nc_matches(rng):
    a = rng.normal(size=(100,)).astype(np.float32)
    b = (a + rng.normal(size=(100,)) * 0.3).astype(np.float32)
    assert abs(float(metrics.nc(a, b)) - oracle.nc(a, b)) < 1e-5
    assert abs(float(metrics.nc(a, a)) - 1.0) < 1e-5
