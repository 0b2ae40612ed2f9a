"""Sharded batch pipelines: multi-chip detect / embed / extract serving.

BASELINE.json config 3 ("score 1k stego images against one meta") is the
canonical use: images shard over the 'batch' mesh axis, the meta arrays
replicate, each chip runs the values-only blocked SVD on its shard, and the
mean/threshold reduction is the only cross-chip communication (XLA inserts
an all-reduce over ICI for it). The same pattern drives multi-chip video
throughput: the frame chunk is the batch.

Compilation contract: every public entry point resolves its jitted
executable from a module-level cache keyed on (body, mesh, static args) —
round 2 re-wrapped a fresh lambda in ``jax.jit`` per call, which recompiled
on EVERY invocation and made the layer unusable for serving. A serving loop
now pays one compile per (mesh, shape) like the single-chip path does.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dctsvd_tpu.models import blocked, image as m_image
from dctsvd_tpu.parallel import mesh as mesh_lib


# --- module-level bodies (stable identities for the jit cache) -----------

def _detect_blocked_body(sweeps, st, sc, sw, alpha):
    return blocked.detect_gray.__wrapped__(st, sc, sw, alpha,
                                           sweeps=sweeps)


def _detect_full_body(st, sc, sw, alpha):
    return jax.vmap(m_image.detect_gray.__wrapped__,
                    in_axes=(0, None, None, None))(st, sc, sw, alpha)


def _embed_prepared_body(kfrac, frames, sw, alpha):
    stego, sc, _, _ = blocked.embed_gray_prepared.__wrapped__(
        frames, sw, alpha, kfrac=kfrac, with_metrics=False)
    return stego, sc


def _extract_prepared_body(kfrac, sweeps, stego, sc, ebasis, inv_blk, sw,
                           alpha):
    return blocked.extract_gray_prepared.__wrapped__(
        stego, sc, ebasis, inv_blk, alpha, kfrac=kfrac, sw=sw,
        sweeps=sweeps)


@functools.lru_cache(maxsize=64)
def _sharded_jit(body, mesh: Mesh, n_batch_args: int, n_args: int,
                 static=()):
    """One jitted executable per (body, mesh, arity, statics): leading-axis
    sharding on the first ``n_batch_args`` args, replication on the rest,
    batch-sharded outputs. Cached at module level so serving loops compile
    once — NOT once per call."""
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    fn = functools.partial(body, *static) if static else body
    return jax.jit(fn,
                   in_shardings=tuple(bs if i < n_batch_args else rep
                                      for i in range(n_args)),
                   out_shardings=bs)


def batch_detect_blocked(stegos: jax.Array, sc: jax.Array, sw: jax.Array,
                         alpha, mesh: Optional[Mesh] = None,
                         per_frame_sc: bool = False,
                         sweeps: Optional[int] = None) -> jax.Array:
    """Scores for [B, H, W, 3] stego batch. B must divide by the mesh's
    batch axis size. Default: one replicated meta scored against many
    images (BASELINE config 3). ``per_frame_sc=True``: ``sc`` is the
    [B, N, 8] per-frame cover spectra from a sharded embed and shards
    with its frames (video-chunk serving). ``sweeps``: the meta's
    embed-time Jacobi schedule (``meta.sweeps``) — the sharded spectrum
    must replay it exactly like single-chip detect_paths does, or the
    (s_cw − sc) residual cancellation breaks for metas embedded under a
    different schedule than this process's serving default."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(_detect_blocked_body, mesh, 2 if per_frame_sc else 1,
                      4, static=(sweeps,))
    return fn(stegos, sc, sw, jnp.float32(alpha))


def batch_detect_full(stegos: jax.Array, sc: jax.Array, sw: jax.Array,
                      alpha, mesh: Optional[Mesh] = None) -> jax.Array:
    """Full-frame (parity-path) batch detect: vmap over the image batch,
    sharded over chips."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(_detect_full_body, mesh, 1, 4)
    return fn(stegos, sc, sw, jnp.float32(alpha))


def batch_embed_prepared(frames: jax.Array, sw: jax.Array, alpha,
                         kfrac: float = 0.6,
                         mesh: Optional[Mesh] = None):
    """Serving-shaped sharded embed: [B, H, W, 3] frames against a
    PreparedWatermark's slot-ordered ``sw`` (replicated). Returns
    (stego u8, sc), both batch-sharded and device-resident — the
    multi-chip analog of blocked.embed_gray_prepared, same jit-cache
    discipline."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(_embed_prepared_body, mesh, 1, 3, static=(kfrac,))
    return fn(frames, sw, jnp.float32(alpha))


def batch_extract_prepared(stegos: jax.Array, sc: jax.Array,
                           ebasis: jax.Array, inv_blk: jax.Array,
                           sw: jax.Array, alpha, kfrac: float = 0.6,
                           mesh: Optional[Mesh] = None,
                           sweeps: Optional[int] = None) -> jax.Array:
    """Sharded serving extract against the prepared pixel basis
    (replicated); per-frame sc shards with its frames. ``sweeps`` replays
    the meta's embed-time schedule (see batch_detect_blocked)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(_extract_prepared_body, mesh, 2, 6,
                      static=(kfrac, sweeps))
    return fn(stegos, sc, ebasis, inv_blk, sw, jnp.float32(alpha))


def _serve_verify_detect_body(kfrac, frames, sw, alpha, ebasis, inv_blk):
    return blocked.serve_verify_detect_color_prepared.__wrapped__(
        frames, sw, alpha, ebasis, inv_blk, kfrac=kfrac)


def batch_serve_verify_detect(frames: jax.Array, sw: jax.Array, alpha,
                              ebasis: jax.Array, inv_blk: jax.Array,
                              kfrac: float = 0.6,
                              mesh: Optional[Mesh] = None):
    """Sharded single-dispatch serve step: embed + extract-verify +
    detect-score each chip's frame shard (blocked.
    serve_verify_detect_color_prepared under shard-in/shard-out jit).
    Returns (stego, sc, recovered, scores), all batch-sharded; zero
    cross-chip collectives — each frame's full pipeline is local."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(_serve_verify_detect_body, mesh, 1, 5,
                      static=(kfrac,))
    return fn(frames, sw, jnp.float32(alpha), ebasis, inv_blk)


def _embed_full_meta_body(kfrac, fr, wm, blk, intra, a):
    r = blocked.embed_gray.__wrapped__(fr, wm, blk, intra, a, kfrac=kfrac)
    return {"stego": r.stego_bgr, "sc": r.sc,
            "uw": r.uw, "vwt": r.vwt, "sw": r.sw,
            "psnr": r.psnr, "ssim": r.ssim}


@functools.lru_cache(maxsize=16)
def _embed_full_meta_jit(mesh: Mesh, kfrac: float):
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    out_sh = {"stego": bs, "sc": bs, "uw": rep, "vwt": rep, "sw": rep,
              # per-frame metrics shard with their frames (psnr was a
              # batch-pooled scalar before the metrics.py per-image fix)
              "psnr": bs, "ssim": bs}
    return jax.jit(functools.partial(_embed_full_meta_body, kfrac),
                   in_shardings=(bs, rep, rep, rep, rep),
                   out_shardings=out_sh)


def batch_embed_blocked(frames: jax.Array, wm_gray: jax.Array,
                        blk_idx: jax.Array, intra_idx: jax.Array, alpha,
                        kfrac: float = 0.6, mesh: Optional[Mesh] = None):
    """Sharded blocked embed over a frame batch [B, H, W, 3]; the watermark
    plane and permutation indices replicate. Returns stego batch + per-frame
    meta arrays (per-frame arrays sharded over 'batch', the shared watermark
    basis and scalar quality metrics replicated)."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    jitted = _embed_full_meta_jit(mesh, kfrac)
    return jitted(frames, wm_gray, blk_idx, intra_idx, jnp.float32(alpha))
