"""Test bootstrap: force CPU with 8 virtual devices (SURVEY.md §4.4).

Tests run on the host platform so they are fast and deterministic; sharding
tests get an 8-way virtual mesh via --xla_force_host_platform_device_count.
Real-TPU runs are exercised by bench.py / __graft_entry__.py, not pytest.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# Hard override via config: the container exports JAX_PLATFORMS=axon (the TPU
# tunnel) and preimports jax via sitecustomize, so the env var is already
# bound — config.update is the only reliable way to force CPU here.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: this container has 1 vCPU and XLA compiles are
# the dominant test cost — cache them across runs.
_CACHE = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# SURVEY §5 sanitizer analog: DCTSVD_DEBUG_CHECKS=1 turns on jax NaN/inf
# checking for the WHOLE suite (CI mode). Off by default because several
# graphs contain where-guarded infs (psnr's 0-mse branch) that the global
# checker would flag; tests/test_debug_checks.py always exercises the
# checked mode on a clean roundtrip regardless.
if os.environ.get("DCTSVD_DEBUG_CHECKS", "").lower() in ("1", "true"):
    from dctsvd_tpu.utils import profiling as _profiling
    _profiling.enable_debug_checks()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture()
def tmp_png(tmp_path):
    def _make(img, name="img.png"):
        import cv2
        p = str(tmp_path / name)
        cv2.imwrite(p, img, [cv2.IMWRITE_PNG_COMPRESSION, 0])
        return p
    return _make


def synthetic_bgr(rng, h, w, blur=True):
    import cv2
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    if blur:
        img = cv2.GaussianBlur(img, (0, 0), 3.0)
    return img


@pytest.fixture()
def make_image(rng):
    return lambda h, w, blur=True: synthetic_bgr(rng, h, w, blur)
