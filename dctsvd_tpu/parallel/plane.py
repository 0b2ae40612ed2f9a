"""Plane-sharded watermarking for very large frames (8K+).

SURVEY.md §2.7 reserves a plane-sharded path for frames too large to
process comfortably on one chip. The blocked scheme makes this trivial:
every 8×8 block is independent, so a single frame splits into horizontal
bands across the mesh — each chip runs the SAME fused embed kernel on its
band with the matching slice of the prepared watermark's singular values,
and embedding needs ZERO collectives (the outputs are disjoint). Detection
needs one tiny all-gather of per-band scores for the global median.

Implemented with ``shard_map`` (manual SPMD) because the fused Pallas
kernels are custom calls XLA's automatic partitioner can't split.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map                      # JAX >= 0.8
    _CHECK_REP_KW = "check_vma"
except ImportError:                                # pragma: no cover
    from jax.experimental.shard_map import shard_map
    _CHECK_REP_KW = "check_rep"
from jax.sharding import Mesh, PartitionSpec as P

from dctsvd_tpu.models import blocked
from dctsvd_tpu.ops import metrics
from dctsvd_tpu.parallel import mesh as mesh_lib
from dctsvd_tpu.utils.config import BLOCK


def _check_divisible(h: int, n: int):
    if h % (BLOCK * n) != 0:
        raise ValueError(
            f"plane-sharded path needs H divisible by 8*n_devices "
            f"({BLOCK * n}); pad the frame first (got H={h}).")


def plane_embed_gray(cover_bgr_u8: jax.Array, sw: jax.Array, alpha,
                     kfrac: float = 0.6,
                     mesh: Optional[Mesh] = None):
    """One [H, W, 3] frame sharded into horizontal bands across the mesh.

    ``sw`` is the prepared watermark's slot-ordered [N, 8] singular values
    (block row-major, so contiguous slices line up with horizontal bands).
    Returns (stego [H, W, 3] u8, sc [N, 8]), both band-sharded on device.
    """
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n = mesh.devices.size
    _check_divisible(cover_bgr_u8.shape[0], n)
    alpha = jnp.float32(alpha)

    def body(cover_band, sw_band):
        stego, sc, _, _ = blocked.embed_gray_prepared.__wrapped__(
            cover_band, sw_band, alpha, kfrac=kfrac, with_metrics=False)
        return stego, sc

    ax = mesh_lib.BATCH_AXIS
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(ax), P(ax)),
                   out_specs=(P(ax), P(ax)))
    return jax.jit(fn)(cover_bgr_u8, sw)


def plane_detect_gray(stego_bgr_u8: jax.Array, sc: jax.Array, sw: jax.Array,
                      alpha, grid: int = 2,
                      mesh: Optional[Mesh] = None) -> jax.Array:
    """Band-NC detection over a plane-sharded frame: each chip scores a
    ``grid × grid`` sub-grid of its band, one all-gather of the
    n·grid² band scores, global median (replicated scalar)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    n = mesh.devices.size
    h, w = stego_bgr_u8.shape[0], stego_bgr_u8.shape[1]
    _check_divisible(h, n)
    alpha_d = jnp.float32(alpha)
    hb_local = h // BLOCK // n
    wb = -(-w // BLOCK)
    ax = mesh_lib.BATCH_AXIS

    def body(stego_band, sc_band, sw_band):
        from dctsvd_tpu.models.blocked import _plane_spectrum
        from dctsvd_tpu.ops import color as c_ops
        y = c_ops.luma_f32(stego_band)
        s_cw = _plane_spectrum(y)
        sw_hat = (s_cw - sc_band) / jnp.maximum(alpha_d, 1e-8)
        # local band scores; keep all of them rather than the local median
        sw_b = jnp.broadcast_to(sw_band, sw_hat.shape)
        g = max(1, min(grid, hb_local, wb))
        gh, gw = hb_local // g, wb // g

        def to_bands(x):
            x = x.reshape(hb_local, wb, BLOCK)[:g * gh, :g * gw, :]
            x = x.reshape(g, gh, g, gw, BLOCK)
            x = jnp.swapaxes(x, 1, 2)
            return x.reshape(g * g, gh * gw * BLOCK)

        bands = metrics.nc(to_bands(sw_b), to_bands(sw_hat))   # [g*g]
        all_bands = jax.lax.all_gather(bands, ax)              # [n, g*g]
        return jnp.median(all_bands.reshape(-1))

    # the all_gather+median output is replicated by construction, but the
    # static varying-axes checker can't prove it — disable the check
    # (named check_rep before JAX 0.8, check_vma after)
    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(ax), P(ax), P(ax)),
                   out_specs=P(), **{_CHECK_REP_KW: False})
    return jax.jit(fn)(stego_bgr_u8, sc, sw)
