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

Compilation contract (same as parallel/batch.py): the shard_map+jit
wrappers are built once per (mesh, statics) via a module-level cache —
the round-2 form rebuilt fresh closures per call, so every frame
retraced and recompiled the full fused graph, and it also baked alpha in
as a constant (alpha is a traced replicated operand now, so alpha sweeps
don't recompile either).
"""

from __future__ import annotations

import functools
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


def _batch_size(mesh: Mesh) -> int:
    """Shards along the 'batch' axis — NOT mesh.devices.size, which also
    counts a 'plane' axis on the 2-D mesh mesh.py reserves and would make
    every band-size computation here wrong."""
    return mesh.shape[mesh_lib.BATCH_AXIS]


def _check_divisible(h: int, n: int):
    if h % (BLOCK * n) != 0:
        raise ValueError(
            f"plane-sharded path needs H divisible by 8*n_shards "
            f"({BLOCK * n}); pad the frame first (got H={h}).")


def _embed_body(kfrac, cover_band, sw_band, alpha):
    stego, sc, _, _ = blocked.embed_gray_prepared.__wrapped__(
        cover_band, sw_band, alpha, kfrac=kfrac, with_metrics=False)
    return stego, sc


@functools.lru_cache(maxsize=32)
def _embed_jit(mesh: Mesh, kfrac: float):
    ax = mesh_lib.BATCH_AXIS
    # check_vma must be off: the fused Pallas kernel inside the body
    # declares its out_shape with ShapeDtypeStruct (no vma annotation),
    # which the static varying-axes checker rejects on real TPU (the CPU
    # tests never see this — they take the XLA fallback kernel)
    fn = shard_map(functools.partial(_embed_body, kfrac), mesh=mesh,
                   in_specs=(P(ax), P(ax), P()),
                   out_specs=(P(ax), P(ax)), **{_CHECK_REP_KW: False})
    return jax.jit(fn)


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
    _check_divisible(cover_bgr_u8.shape[0], _batch_size(mesh))
    return _embed_jit(mesh, kfrac)(cover_bgr_u8, sw, jnp.float32(alpha))


def _detect_body(grid, sweeps, kfrac, stego_band, sc_band, sw_band, alpha):
    from dctsvd_tpu.models.blocked import _plane_spectrum, k_of_block
    from dctsvd_tpu.ops import color as c_ops
    y = c_ops.luma_f32(stego_band)
    s_cw = _plane_spectrum(y, sweeps)
    # restrict to the k EMBEDDED components, exactly like detect_gray —
    # the statistic the ROC threshold was calibrated on; rows >= k carry
    # only (delta/alpha)-amplified noise that would skew the scale and
    # presence gates (round-4 review)
    k = k_of_block(kfrac)
    # rectified at 0 — same statistic as detect_gray (see the note
    # there; scale-reduction attacks inject impossible negatives)
    sw_hat = jnp.maximum((s_cw - sc_band)[..., :k], 0.0) \
        / jnp.maximum(alpha, 1e-8)
    # local band scores; keep all of them rather than the local median
    sw_b = jnp.broadcast_to(sw_band[..., :k], sw_hat.shape)
    hb_local = stego_band.shape[0] // BLOCK        # band dims, not global
    wb = -(-stego_band.shape[1] // BLOCK)
    g = max(1, min(grid, hb_local, wb))
    gh, gw = hb_local // g, wb // g

    def to_bands(x):
        x = x.reshape(hb_local, wb, k)[:g * gh, :g * gw, :]
        x = x.reshape(g, gh, g, gw, k)
        x = jnp.swapaxes(x, 1, 2)
        return x.reshape(g * g, gh * gw, k)

    sw_bands, hat_bands = to_bands(sw_b), to_bands(sw_hat)
    sw_f = sw_bands.reshape(g * g, -1)
    hat_f = hat_bands.reshape(g * g, -1)
    bands = (metrics.nc(sw_f, hat_f)                           # [g*g]
             * blocked.band_scale_damp(sw_f, hat_f)
             * blocked.band_presence_damp(sw_bands, hat_bands))
    all_bands = jax.lax.all_gather(bands, mesh_lib.BATCH_AXIS)  # [n, g*g]
    return jnp.median(all_bands.reshape(-1))


@functools.lru_cache(maxsize=32)
def _detect_jit(mesh: Mesh, grid: int, sweeps: Optional[int],
                kfrac: float):
    ax = mesh_lib.BATCH_AXIS
    # the all_gather+median output is replicated by construction, but the
    # static varying-axes checker can't prove it — disable the check
    # (named check_rep before JAX 0.8, check_vma after)
    fn = shard_map(functools.partial(_detect_body, grid, sweeps, kfrac),
                   mesh=mesh,
                   in_specs=(P(ax), P(ax), P(ax), P()),
                   out_specs=P(), **{_CHECK_REP_KW: False})
    return jax.jit(fn)


def plane_detect_gray(stego_bgr_u8: jax.Array, sc: jax.Array, sw: jax.Array,
                      alpha, grid: int = 2,
                      mesh: Optional[Mesh] = None,
                      sweeps: Optional[int] = None,
                      kfrac: float = 0.6) -> jax.Array:
    """Band-NC detection over a plane-sharded frame: each chip scores a
    ``grid × grid`` sub-grid of its band, one all-gather of the
    n·grid² band scores, global median (replicated scalar). ``sweeps``
    replays the embed-time Jacobi schedule (``meta.sweeps`` — same
    contract as blocked._plane_spectrum; detection of a persisted sc
    under a different backend/schedule silently degrades without it)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    _check_divisible(stego_bgr_u8.shape[0], _batch_size(mesh))
    return _detect_jit(mesh, grid, sweeps, kfrac)(stego_bgr_u8, sc, sw,
                                                  jnp.float32(alpha))
