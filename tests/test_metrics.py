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


def test_psnr_per_image_over_batch(rng):
    """psnr returns one value PER IMAGE over leading batch dims (it used
    to pool the whole batch into a single scalar, averaging bad frames
    away and diverging from ssim's per-item shape — code-review r3)."""
    import jax.numpy as jnp
    from dctsvd_tpu.ops import metrics
    a = rng.integers(0, 256, (3, 32, 32, 3), np.uint8)
    b = a.copy()
    b[1] = np.clip(b[1].astype(int) + 8, 0, 255).astype(np.uint8)
    ps = np.asarray(metrics.psnr(jnp.asarray(a), jnp.asarray(b)))
    assert ps.shape == (3,)
    assert ps[0] == 99.0 and ps[2] == 99.0 and ps[1] < 40
    # gray batch: trailing dim is W (not a channel axis) -> per-plane
    g = rng.integers(0, 256, (4, 32, 32), np.uint8)
    assert np.asarray(metrics.psnr(jnp.asarray(g), jnp.asarray(g))).shape \
        == (4,)
    # explicit override for shapes the heuristic cannot distinguish
    assert np.asarray(metrics.psnr(jnp.asarray(a), jnp.asarray(a),
                                   image_ndim=4)).shape == ()
