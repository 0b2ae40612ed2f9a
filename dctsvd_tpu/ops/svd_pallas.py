"""Pallas TPU kernel: batched one-sided Jacobi SVD of 8×8 blocks.

The XLA formulation in ops/svd.py lowers each of the 224 (8 sweeps × 28
pairs) rotation steps to elementwise ops over the full [8, 8, N] tensor —
correctness-identical, but every step round-trips HBM (~3.7 GB of traffic
for a 1080p frame's 32 400 blocks). This kernel keeps a lane-aligned
[8, 8, TILE] tile resident in VMEM for the whole sweep schedule: one read,
one write per tile, the rotations are VPU work on [8, TILE] slices with the
batch on lanes, and the final ordering is a Batcher sorting network (19
compare-exchanges) instead of a generic sort.

Implementation note: columns are carried as PYTHON LISTS of [m, TILE]
values, never stacked-and-indexed — ``x.at[i].set`` on a value lowers to a
``scatter``, which Pallas TPU cannot lower (verified on hardware); list
reassignment is pure SSA and costs nothing. The [N, 8, 8] <-> [8·8, N]
transposes happen in XLA outside the kernel where they fuse with the
neighbouring DCT einsums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Batcher odd-even mergesort network for 8 elements (19 comparators).
_SORT_NET = [(0, 1), (2, 3), (4, 5), (6, 7),
             (0, 2), (1, 3), (4, 6), (5, 7),
             (1, 2), (5, 6),
             (0, 4), (1, 5), (2, 6), (3, 7),
             (2, 4), (3, 5),
             (1, 2), (3, 4), (5, 6)]


def _rotation(app, aqq, apq):
    """Stable Jacobi rotation; returns (c, s, t=s/c, ic=1/c); all inputs
    [TILE].

    Also returns ic = 1/c (free here, needed by the fast-scaled update
    form in ops/wm_pallas.py).

    Two rsqrt and pure mults/adds — no divisions or plain sqrt. The VPU
    serializes transcendental ops at several cycles per vreg, and profiling
    showed the classic form (2 div for ζ and t, sqrt, rsqrt, plus the
    caller's t=s/c div — 5 transcendentals per rotation) was ~1/3 of the
    whole Jacobi kernel. Algebra, with d = aqq−app, e = 2·apq,
    r = √(d²+e²):

        t = sign(ζ)/(|ζ|+√(1+ζ²)) = sign(d)·e/(|d|+r)
        c² = 1/(1+t²)            = (r+|d|)/(2r) = ½ + ½·|d|/r
        s  = c·t                 = ½·sign(d)·e·(1/r)·(1/c)

    so ir = rsqrt(d²+e²) and ic = rsqrt(c²) are the only transcendentals;
    c = c²·ic and t = s·ic. Bitwise this matches the classic form to
    rounding (verified against it in tests/test_svd.py)."""
    d = aqq - app
    e = 2.0 * apq
    h2 = d * d + e * e
    safe = h2 > 1e-60                     # d = e = 0: no rotation at all
    ir = jax.lax.rsqrt(jnp.where(safe, h2, 1.0))
    c2 = 0.5 + 0.5 * jnp.abs(d) * ir
    ic = jax.lax.rsqrt(c2)
    ic = jnp.where(safe, ic, 1.0)
    c = jnp.where(safe, c2 * ic, 1.0)
    sgn = jnp.where(d >= 0, 0.5, -0.5)    # fold the ½ into the sign factor
    s = jnp.where(safe, sgn * e * ir * ic, 0.0)
    t = s * ic
    return c, s, t, ic


def _make_kernel(n: int, m: int, sweeps, compute_uv: bool):
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    # fractional sweep schedules: full cyclic sweeps + a prefix of the
    # next (same pair-grid semantics as ops/wm_pallas._schedule, so a
    # fractional-tier meta replays identically on every Jacobi path)
    full_sweeps = int(sweeps)
    extra_pairs = int(round((float(sweeps) - full_sweeps) * len(pairs)))
    full_sweeps += extra_pairs // len(pairs)
    extra_pairs %= len(pairs)

    def kernel(*refs):
        if compute_uv:
            g_ref, u_ref, s_ref, vt_ref = refs
        else:
            g_ref, s_ref = refs
        tile = g_ref.shape[-1]
        dtype = g_ref.dtype

        # columns as lists — scatter-free SSA updates
        g = [g_ref[i] for i in range(n)]                 # n × [m, TILE]
        if compute_uv:
            v = []
            for i in range(n):
                col = jnp.zeros((n, tile), dtype)
                col = col + (jnp.arange(n, dtype=jnp.int32)[:, None] == i
                             ).astype(dtype)
                v.append(col)                            # n × [n, TILE]
        else:
            v = None

        # Rutishauser norm caching (see ops/wm_pallas.py): only the cross
        # dot apq needs a reduction per pair; column norms update
        # algebraically and final singular values use fresh norms.
        norms = [jnp.sum(g[i] * g[i], axis=0) for i in range(n)]

        def rotate(g, norms, v, rot_pairs):
            for p, q in rot_pairs:
                gp, gq = g[p], g[q]                      # [m, TILE]
                app, aqq = norms[p], norms[q]
                apq = jnp.sum(gp * gq, axis=0)           # [TILE]
                c, s, t, _ = _rotation(app, aqq, apq)
                norms[p] = app - t * apq
                norms[q] = aqq + t * apq
                g[p] = c * gp - s * gq
                g[q] = s * gp + c * gq
                if v is not None:
                    vp, vq = v[p], v[q]
                    v[p] = c * vp - s * vq
                    v[q] = s * vp + c * vq
            return g, norms, v

        def sweep(_, carry):
            if compute_uv:
                g, norms, v = carry
                g, norms, v = list(g), list(norms), list(v)
            else:
                g, norms = list(carry[0]), list(carry[1])
                v = None
            g, norms, v = rotate(g, norms, v, pairs)
            if compute_uv:
                return tuple(g), tuple(norms), tuple(v)
            return tuple(g), tuple(norms)

        if compute_uv:
            g, norms, v = jax.lax.fori_loop(
                0, full_sweeps, sweep, (tuple(g), tuple(norms), tuple(v)))
            g, norms, v = list(g), list(norms), list(v)
            if extra_pairs:
                g, norms, v = rotate(g, norms, v, pairs[:extra_pairs])
        else:
            g, norms = jax.lax.fori_loop(0, full_sweeps, sweep,
                                         (tuple(g), tuple(norms)))
            g, norms = list(g), list(norms)
            if extra_pairs:
                g, norms, _ = rotate(g, norms, None, pairs[:extra_pairs])

        s = [jnp.sqrt(jnp.sum(g[i] * g[i], axis=0)) for i in range(n)]

        # descending order via the Batcher network; swap singular values and
        # (for the full variant) the matching U/V columns — all list ops.
        if compute_uv:
            u = []
            for i in range(n):
                denom = jnp.maximum(s[i], 1e-30)
                u.append(g[i] / denom[None, :])
            for i, j in _SORT_NET:
                swap = s[i] < s[j]                       # [TILE]
                si, sj = s[i], s[j]
                s[i] = jnp.where(swap, sj, si)
                s[j] = jnp.where(swap, si, sj)
                ui, uj = u[i], u[j]
                u[i] = jnp.where(swap[None, :], uj, ui)
                u[j] = jnp.where(swap[None, :], ui, uj)
                vi, vj = v[i], v[j]
                v[i] = jnp.where(swap[None, :], vj, vi)
                v[j] = jnp.where(swap[None, :], vi, vj)
            u_ref[:] = jnp.stack(u, axis=0)              # [n, m, TILE]
            s_ref[:] = jnp.stack(s, axis=0)              # [n, TILE]
            vt_ref[:] = jnp.stack(v, axis=0)             # [n, n, TILE]
        else:
            for i, j in _SORT_NET:
                swap = s[i] < s[j]
                si, sj = s[i], s[j]
                s[i] = jnp.where(swap, sj, si)
                s[j] = jnp.where(swap, si, sj)
            s_ref[:] = jnp.stack(s, axis=0)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("sweeps", "compute_uv", "tile",
                                    "interpret"))
def jacobi_svd_pallas(a: jax.Array, sweeps=5,
                      compute_uv: bool = True, tile: int = 512,
                      interpret: bool = False):
    """Drop-in for ops.svd.jacobi_svd on [..., m, n] f32 with n == m == 8
    (any m >= n works). Returns (U, S, Vt) or S."""
    *batch, m, n = a.shape
    bsz = 1
    for d in batch:
        bsz *= d

    npad = -(-bsz // tile) * tile
    cols = jnp.transpose(a.reshape(bsz, m, n), (2, 1, 0))   # [n, m, B]
    if npad != bsz:
        cols = jnp.pad(cols, ((0, 0), (0, 0), (0, npad - bsz)))

    grid = (npad // tile,)
    in_spec = pl.BlockSpec((n, m, tile), lambda i: (0, 0, i),
                           memory_space=pltpu.VMEM)
    kernel = _make_kernel(n, m, sweeps, compute_uv)

    if compute_uv:
        out_shape = (
            jax.ShapeDtypeStruct((n, m, npad), a.dtype),   # U columns
            jax.ShapeDtypeStruct((n, npad), a.dtype),      # S
            jax.ShapeDtypeStruct((n, n, npad), a.dtype),   # V columns
        )
        out_specs = (
            pl.BlockSpec((n, m, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        )
        u_cols, s, v_cols = pl.pallas_call(
            kernel, grid=grid, out_shape=out_shape,
            in_specs=[in_spec], out_specs=out_specs,
            interpret=interpret)(cols)
        u = jnp.transpose(u_cols[..., :bsz], (2, 1, 0)).reshape(
            *batch, m, n)
        vt = jnp.transpose(v_cols[..., :bsz], (2, 0, 1)).reshape(
            *batch, n, n)
        s_b = jnp.transpose(s[:, :bsz]).reshape(*batch, n)
        return u, s_b, vt

    out_shape = jax.ShapeDtypeStruct((n, npad), a.dtype)
    out_specs = pl.BlockSpec((n, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    s = pl.pallas_call(kernel, grid=grid, out_shape=out_shape,
                       in_specs=[in_spec], out_specs=out_specs,
                       interpret=interpret)(cols)
    return jnp.transpose(s[:, :bsz]).reshape(*batch, n)
