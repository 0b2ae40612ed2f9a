"""Device→host transfer shim.

The axon TPU tunnel in this environment hangs indefinitely on uint8
device→host transfers (verified: ``np.asarray`` of a plain u8 device array
never returns, while f32/i32 transfers work). All pipelines keep u8 on
device; this shim widens u8 to int32 on device for the copy and narrows
back on host. On CPU and regular TPU backends it's a straight
``np.asarray``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _needs_u8_widening(x) -> bool:
    try:
        if x.dtype != jnp.uint8:
            return False
        platforms = {d.platform for d in x.devices()}
        return "cpu" not in platforms
    except AttributeError:
        return False


def to_numpy(x) -> np.ndarray:
    """np.asarray that is safe for u8 arrays on the axon backend."""
    if isinstance(x, jax.Array) and _needs_u8_widening(x):
        return np.asarray(x.astype(jnp.int32)).astype(np.uint8)
    return np.asarray(x)
