"""Sharded batch pipelines: multi-chip detect / embed / extract.

BASELINE.json config 3 ("score 1k stego images against one meta") is the
canonical use: images shard over the 'batch' mesh axis, the meta arrays
replicate, each chip runs the values-only blocked SVD on its shard, and the
mean/threshold reduction is the only cross-chip communication (XLA inserts
an all-reduce over ICI for it). The same pattern drives multi-chip video
throughput: the frame chunk is the batch.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dctsvd_tpu.models import blocked, image as m_image
from dctsvd_tpu.parallel import mesh as mesh_lib


def _sharded_jit(fn, mesh: Mesh, n_batch_args: int):
    """jit with leading-axis sharding on the first n args, replication on
    the rest, sharded outputs."""
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def in_shardings(nargs):
        return tuple(bs if i < n_batch_args else rep for i in range(nargs))

    def wrapper(*args):
        jitted = jax.jit(fn, in_shardings=in_shardings(len(args)),
                         out_shardings=bs)
        return jitted(*args)
    return wrapper


def batch_detect_blocked(stegos: jax.Array, sc: jax.Array, sw: jax.Array,
                         alpha, mesh: Optional[Mesh] = None) -> jax.Array:
    """Scores for [B, H, W, 3] stego batch against one blocked meta.
    B must divide by the mesh's batch axis size."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    fn = _sharded_jit(
        lambda st, sc_, sw_, a: blocked.detect_gray.__wrapped__(st, sc_, sw_, a),
        mesh, 1)
    return fn(stegos, sc, sw, jnp.float32(alpha))


def batch_detect_full(stegos: jax.Array, sc: jax.Array, sw: jax.Array,
                      alpha, mesh: Optional[Mesh] = None) -> jax.Array:
    """Full-frame (parity-path) batch detect: vmap over the image batch,
    sharded over chips."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    body = jax.vmap(m_image.detect_gray.__wrapped__,
                    in_axes=(0, None, None, None))
    fn = _sharded_jit(body, mesh, 1)
    return fn(stegos, sc, sw, jnp.float32(alpha))


def batch_embed_blocked(frames: jax.Array, wm_gray: jax.Array,
                        blk_idx: jax.Array, intra_idx: jax.Array, alpha,
                        kfrac: float = 0.6, mesh: Optional[Mesh] = None):
    """Sharded blocked embed over a frame batch [B, H, W, 3]; the watermark
    plane and permutation indices replicate. Returns stego batch + per-frame
    meta arrays, all sharded over 'batch'."""
    if mesh is None:
        mesh = mesh_lib.make_mesh()
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)

    def body(fr, wm, blk, intra, a):
        r = blocked.embed_gray.__wrapped__(fr, wm, blk, intra, a,
                                           kfrac=kfrac)
        # per-frame arrays shard over 'batch'; the shared watermark basis
        # and the scalar quality metrics replicate
        return {"stego": r.stego_bgr, "sc": r.sc,
                "uw": r.uw, "vwt": r.vwt, "sw": r.sw,
                "psnr": r.psnr, "ssim": r.ssim}

    out_sh = {"stego": bs, "sc": bs, "uw": rep, "vwt": rep, "sw": rep,
              "psnr": rep, "ssim": rep}
    jitted = jax.jit(body, in_shardings=(bs, rep, rep, rep, rep),
                     out_shardings=out_sh)
    return jitted(frames, wm_gray, blk_idx, intra_idx, jnp.float32(alpha))
