"""MXU-formulation prototype for the batched 8x8 SVD (VERDICT round-1 #2).

Hypothesis under test: can the per-block Jacobi rotations ride the MXU by
composing each tournament round's 4 disjoint rotations into an 8x8
orthogonal matrix J per block and applying it as a batched matmul
G <- G @ J (and V <- V @ J)? That turns ~85% of the FLOPs into dot_generals.

The catch (documented in STATUS.md after measurement): the MXU contracts
across lanes with a weight operand SHARED over the batch; per-block J
matrices vary per batch element, so XLA lowers `nij,njk->nik` with an
8-deep contraction — at best a heavily-padded (8 of 128 lanes) systolic
pass, at worst VPU elementwise expansion. This script measures the truth
at the bench's block count.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/mxu_svd_prototype.py
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import svd_pallas


def round_robin_rounds(n=8):
    """7 rounds x 4 disjoint pairs covering all 28 (circle method)."""
    others = list(range(1, n))
    rounds = []
    for _ in range(n - 1):
        arr = [0] + others
        pairs = sorted(tuple(sorted((arr[i], arr[n - 1 - i])))
                       for i in range(n // 2))
        rounds.append(pairs)
        others = [others[-1]] + others[:-1]
    return rounds

ROUNDS = round_robin_rounds(8)


def _rotation(app, aqq, apq):
    denom = 2.0 * apq
    safe = jnp.abs(denom) > 1e-30
    zeta = jnp.where(safe, (aqq - app) / jnp.where(safe, denom, 1.0), 0.0)
    sgn = jnp.where(zeta >= 0, 1.0, -1.0)
    t = sgn / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    t = jnp.where(safe, t, 0.0)
    c = jax.lax.rsqrt(1.0 + t * t)
    return c, c * t


def _round_masks(pairs):
    """Constant [4,8,8] mask tensors: J = I-part + c-part + s-part."""
    mc = np.zeros((4, 8, 8), np.float32)   # multiplies c_k
    ms = np.zeros((4, 8, 8), np.float32)   # multiplies s_k
    for k, (p, q) in enumerate(pairs):
        mc[k, p, p] = mc[k, q, q] = 1.0
        ms[k, p, q] = 1.0
        ms[k, q, p] = -1.0
    return jnp.asarray(mc), jnp.asarray(ms)

MASKS = [_round_masks(p) for p in ROUNDS]


@functools.partial(jax.jit, static_argnames=("sweeps", "compute_uv"))
def jacobi_svd_mxu(g, sweeps=5, compute_uv=True):
    """[N,8,8] batched one-sided Jacobi, rotations applied as batched
    matmuls (einsum nij,njk->nik) so XLA can route them to the MXU."""
    n = g.shape[0]
    v = jnp.broadcast_to(jnp.eye(8, dtype=g.dtype), g.shape) if compute_uv \
        else None

    def sweep(carry, _):
        g, v = carry
        for pairs, (mc, ms) in zip(ROUNDS, MASKS):
            gram_cols = []
            for (p, q) in pairs:
                gp, gq = g[:, :, p], g[:, :, q]
                app = jnp.sum(gp * gp, axis=1)
                aqq = jnp.sum(gq * gq, axis=1)
                apq = jnp.sum(gp * gq, axis=1)
                gram_cols.append((app, aqq, apq))
            app = jnp.stack([t[0] for t in gram_cols])   # [4, N]
            aqq = jnp.stack([t[1] for t in gram_cols])
            apq = jnp.stack([t[2] for t in gram_cols])
            c, s = _rotation(app, aqq, apq)              # [4, N]
            j = (jnp.einsum("kn,kab->nab", c, mc)
                 + jnp.einsum("kn,kab->nab", s, ms))     # [N, 8, 8]
            g = jnp.einsum("nij,njk->nik", g, j)         # THE matmul
            if v is not None:
                v = jnp.einsum("nij,njk->nik", v, j)
        return (g, v), None

    (g, v), _ = jax.lax.scan(sweep, (g, v), None, length=sweeps)
    s = jnp.sqrt(jnp.sum(g * g, axis=1))                 # [N, 8]
    if not compute_uv:
        return jnp.sort(s, axis=-1)[:, ::-1]
    order = jnp.argsort(-s, axis=-1)
    s_sorted = jnp.take_along_axis(s, order, axis=-1)
    u = g / jnp.maximum(s, 1e-30)[:, None, :]
    u = jnp.take_along_axis(u, order[:, None, :], axis=-1)
    vt = jnp.swapaxes(jnp.take_along_axis(v, order[:, None, :], axis=-1),
                      1, 2)
    return u, s_sorted, vt


def timed(name, fn, args, iters=4):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        for leaf in jax.tree_util.tree_leaves(out):
            acc = acc + jnp.mean(leaf.astype(jnp.float32))
        return acc
    acc = step(jnp.float32(0.0), *args)
    float(acc)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = step(acc, *args)
    float(acc)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:45s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 777600                                   # the bench's block count
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.standard_normal((n, 8, 8)).astype(np.float32))

    # correctness first (small batch)
    small = blocks[:512]
    u, s, vt = jacobi_svd_mxu(small, sweeps=6)
    rec = jnp.einsum("nij,nj,njk->nik", u, s, vt)
    err = float(jnp.max(jnp.abs(rec - small)))
    s_ref = np.linalg.svd(np.asarray(small), compute_uv=False)
    serr = float(np.max(np.abs(np.asarray(s) - s_ref) / (s_ref[:, :1])))
    print(f"recon err {err:.2e}, sv rel err {serr:.2e}", flush=True)

    print(f"\ntiming at N={n}:", flush=True)
    timed("MXU-form jacobi UV (batched-matmul rounds)",
          lambda b: jacobi_svd_mxu(b, sweeps=5, compute_uv=True), (blocks,))
    timed("MXU-form jacobi values-only",
          lambda b: jacobi_svd_mxu(b, sweeps=5, compute_uv=False), (blocks,))
    timed("pallas kernel UV (baseline)",
          lambda b: svd_pallas.jacobi_svd_pallas(b, sweeps=5,
                                                 compute_uv=True), (blocks,))
    timed("pallas kernel values-only (baseline)",
          lambda b: svd_pallas.jacobi_svd_pallas(b, sweeps=5,
                                                 compute_uv=False), (blocks,))


if __name__ == "__main__":
    main()
