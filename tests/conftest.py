"""Test bootstrap: force CPU with 8 virtual devices (SURVEY.md §4.4).

Tests run on the host platform so they are fast and deterministic; sharding
tests get an 8-way virtual mesh via --xla_force_host_platform_device_count.
Real-TPU runs are exercised by bench.py / __graft_entry__.py, not pytest.
"""

import os

import re as _re
flags = os.environ.get("XLA_FLAGS", "")
_m = _re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
elif int(_m.group(1)) < 8:
    # a pre-existing smaller count (leftover env) would give the 8-way
    # sharding tests too few devices, failing with what looks like a
    # product bug
    os.environ["XLA_FLAGS"] = flags.replace(
        _m.group(0), "--xla_force_host_platform_device_count=8")
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
# checking for the WHOLE suite (CI mode). The full 132-test suite is
# green under it (verified 2026-08-18, after replacing the deliberate
# NaN metric placeholders with -1 sentinels); off by default only for
# speed. tests/test_debug_checks.py always exercises the checked mode
# on a clean roundtrip regardless.
if os.environ.get("DCTSVD_DEBUG_CHECKS", "").lower() in ("1", "true"):
    from dctsvd_tpu.utils import profiling as _profiling
    _profiling.enable_debug_checks()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries. The full suite
    compiles hundreds of XLA:CPU executables in one process; past ~130
    tests the NEXT compile segfaults inside backend_compile_and_load
    (reproducible at test_wm_pallas::test_roundtrip_matches_split; every
    half-suite subset passes, either half + wm_pallas passes — the
    trigger is cumulative compiled-module state, not any one graph).
    Clearing per module keeps the live-executable population bounded;
    the persistent disk cache makes the re-compiles cheap reads.

    Toolchain pin for the repro: jax/jaxlib 0.9.0 on linux x86-64,
    XLA:CPU, --xla_force_host_platform_device_count=8, 1 physical core.
    Minimal repro recipe: run the suite with this fixture deleted —
    the ~139th distinct executable compiled by one process SIGSEGVs in
    backend_compile_and_load. Re-check on every jax upgrade; if a new
    version survives the fixture-less run, delete the fixture (module
    ordering should not be load-bearing for suite stability)."""
    yield
    jax.clear_caches()


@pytest.fixture()
def rng(request):
    """Per-TEST deterministic generator (was one session-scoped stream:
    every generated image depended on which tests ran before it, so a
    marginal threshold failure in a full run could not be reproduced by
    running the one test). Seeded from the test's node id so each test
    sees the same draws regardless of selection or order."""
    import zlib
    return np.random.default_rng(
        zlib.crc32(request.node.nodeid.encode()))


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
