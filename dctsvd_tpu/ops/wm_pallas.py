"""Fused Pallas TPU kernels for the blocked watermark hot paths.

Composing the blocked pipeline out of XLA einsums + the standalone Jacobi
kernel still pays ~5 HBM round trips per frame batch (DCT coefficients,
column-layout transposes in/out of the SVD, reconstruction, inverse DCT).
These kernels keep one 8-row band of blocks (``[8, Wb, 8]``, a full block
row of the frame) resident in VMEM and run the ENTIRE per-block pipeline on
it in registers:

  embed:    DCT -> one-sided Jacobi (U, S, V) -> S' = S + α·mask·Sw ->
            U·diag(S')·Vᵀ -> IDCT            (outputs marked plane + Sc)
  spectrum: DCT -> one-sided Jacobi (S only)  (outputs per-block S — the
            extract/detect front half)

Everything between the plane read and the plane write — coefficients,
rotations, singular vectors — never touches HBM. Layout: block columns are
carried as Python lists of ``[8, Wb]`` values (batch of blocks on lanes,
matrix rows on sublanes); the 8×8 DCT bases are unrolled as Python-float
constants so each basis multiply is a broadcast FMA, and ``x.at[i].set``
(scatter — unsupported by Mosaic) never appears.

The per-block math matches ops/svd.jacobi_svd + ops/dct exactly (same
rotation formula, same Batcher ordering network); tests compare against the
XLA composition in interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dctsvd_tpu.ops.dct import _dct_matrix_np
from dctsvd_tpu.ops.svd_pallas import _SORT_NET, _rotation

B = 8                       # block size

# Pair ordering: cyclic-by-rows. A Brent–Luk tournament ordering (7 rounds
# of 4 disjoint pairs, phase-batched for ILP) was measured on hardware and
# gave ZERO speedup — the kernel's vector-op retire rate is the bound, not
# the dependency chain — while costing one extra sweep of convergence, so
# cyclic wins. Sweeps: DCT blocks converge to 1.4e-6 relative in 4 cyclic
# sweeps, but matrices with clustered singular values (random Gaussian)
# need 5 for orthogonal U — keep 5 as the safe default.
_SWEEPS_DEFAULT = 5
# Mosaic assigns a stack slot per live SSA value; the unrolled 28-pair
# sweep body keeps ~300 [R, 8, Wb] values live, which overflows the
# default 16 MiB scoped-vmem budget for useful R — raise it (v5e has
# 128 MiB VMEM; in/out windows stay small).
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
PAIRS = [(p, q) for p in range(B - 1) for q in range(p + 1, B)]


def _left_mul_rows(m, a_j):
    """rows of (M · A_j) for an 8×8 python-float matrix M and [..., 8, W]
    A_j: out[..., i, :] = Σ_k M[i][k] · A_j[..., k, :]. Built row-by-row
    with scalar FMAs (pallas kernels may not capture constant arrays)."""
    rows = []
    for i in range(B):
        acc = a_j[..., 0, :] * m[i][0]
        for k in range(1, B):
            acc = acc + a_j[..., k, :] * m[i][k]
        rows.append(acc)                             # [..., W]
    return jnp.stack(rows, axis=-2)                  # [..., 8, W]


def _dct_cols(xc, d):
    """Block DCT in column layout: xc = list of 8 [8, W] column values.
    C = D X Dᵀ. Returns list of 8 [8, W] coefficient columns."""
    # right-multiply: A = X Dᵀ  =>  a[j] = Σ_c xc[c] · D[j, c]
    a = []
    for j in range(B):
        acc = xc[0] * d[j][0]
        for c in range(1, B):
            acc = acc + xc[c] * d[j][c]
        a.append(acc)
    # left-multiply: C = D A
    return [_left_mul_rows(d, a[j]) for j in range(B)]


def _idct_cols(cc, d):
    """Inverse: Y = Dᵀ C D in column layout."""
    # right-multiply: E = C D  =>  e[j] = Σ_c cc[c] · D[c, j]
    e = []
    for j in range(B):
        acc = cc[0] * d[0][j]
        for c in range(1, B):
            acc = acc + cc[c] * d[c][j]
        e.append(acc)
    # left-multiply: Y = Dᵀ E, (Dᵀ)[i][k] = D[k][i]
    dt = [[d[k][i] for k in range(B)] for i in range(B)]
    return [_left_mul_rows(dt, e[j]) for j in range(B)]


def _jacobi_cols(g, sweeps, compute_uv):
    """One-sided Jacobi on column lists of [..., 8, W] values; returns
    (u, s, v) or s, sorted descending (same math as
    svd_pallas._make_kernel). Scalars (dots, singular values) are
    [..., W]; the leading dims batch extra block rows per grid cell."""
    shape = g[0].shape                               # [..., 8, W]
    if compute_uv:
        v = []
        for i in range(B):
            col = jnp.zeros(shape, jnp.float32)
            col = col + (jnp.arange(B, dtype=jnp.int32)[:, None] == i
                         ).astype(jnp.float32)
            v.append(col)

    # Rutishauser norm caching: column norms update algebraically after
    # each rotation (n'p = np − t·apq, n'q = nq + t·apq) so only the cross
    # dot apq needs a reduction — 1/3 the reductions of the textbook form.
    # Measured perf-neutral on v5e (the kernel is bound by sequential
    # vector-op issue, not op mix) but strictly less work; final singular
    # values still come from fresh norms.
    norms = [jnp.sum(g[i] * g[i], axis=-2) for i in range(B)]

    def sweep(_, carry):
        if compute_uv:
            g, norms, v = carry
            g, norms, v = list(g), list(norms), list(v)
        else:
            (g, norms), v = (list(carry[0]), list(carry[1])), None
        for p, q in PAIRS:
            gp, gq = g[p], g[q]
            app, aqq = norms[p], norms[q]
            apq = jnp.sum(gp * gq, axis=-2)
            c, s = _rotation(app, aqq, apq)
            t = s / c
            norms[p] = app - t * apq
            norms[q] = aqq + t * apq
            c, s = c[..., None, :], s[..., None, :]
            g[p] = c * gp - s * gq
            g[q] = s * gp + c * gq
            if v is not None:
                vp, vq = v[p], v[q]
                v[p] = c * vp - s * vq
                v[q] = s * vp + c * vq
        if compute_uv:
            return tuple(g), tuple(norms), tuple(v)
        return tuple(g), tuple(norms)

    if compute_uv:
        g, _, v = jax.lax.fori_loop(
            0, sweeps, sweep, (tuple(g), tuple(norms), tuple(v)))
        g, v = list(g), list(v)
    else:
        g, _ = jax.lax.fori_loop(0, sweeps, sweep,
                                 (tuple(g), tuple(norms)))
        g = list(g)

    s = [jnp.sqrt(jnp.sum(g[i] * g[i], axis=-2)) for i in range(B)]

    if not compute_uv:
        for i, j in _SORT_NET:
            swap = s[i] < s[j]
            si, sj = s[i], s[j]
            s[i] = jnp.where(swap, sj, si)
            s[j] = jnp.where(swap, si, sj)
        return s

    u = [g[i] / jnp.maximum(s[i], 1e-30)[..., None, :] for i in range(B)]
    for i, j in _SORT_NET:
        swap = s[i] < s[j]
        si, sj = s[i], s[j]
        s[i] = jnp.where(swap, sj, si)
        s[j] = jnp.where(swap, si, sj)
        sw2 = swap[..., None, :]
        ui, uj = u[i], u[j]
        u[i] = jnp.where(sw2, uj, ui)
        u[j] = jnp.where(sw2, ui, uj)
        vi, vj = v[i], v[j]
        v[i] = jnp.where(sw2, vj, vi)
        v[j] = jnp.where(sw2, vi, vj)
    return u, s, v


def _make_embed_kernel(sweeps: int):
    d = _dct_matrix_np(B).tolist()                   # python-float constants

    def kernel(x_ref, sws_ref, out_ref, sc_ref):
        x = x_ref[0]                                 # [R, 8(row), 8(col), Wb]
        xc = [x[:, :, c, :] for c in range(B)]       # R×[?]: [R, 8, Wb]
        coefs = _dct_cols(xc, d)
        u, s, v = _jacobi_cols(coefs, sweeps, compute_uv=True)

        sws = sws_ref[0]                             # [R, 8, Wb] (α·mask·Sw)
        s2 = [s[j] + sws[:, j, :] for j in range(B)]

        # C' = U diag(S') Vᵀ:  col k = Σ_j u[j] · (s2[j]·V[k, j])
        cw = []
        for k in range(B):
            acc = u[0] * (s2[0] * v[0][:, k, :])[:, None, :]
            for j in range(1, B):
                acc = acc + u[j] * (s2[j] * v[j][:, k, :])[:, None, :]
            cw.append(acc)

        y = _idct_cols(cw, d)
        out_ref[0] = jnp.stack(y, axis=2)            # [R, 8, 8, Wb]
        sc_ref[0] = jnp.stack(s, axis=1)             # [R, 8, Wb]

    return kernel


def _make_embed_kernel_delta(sweeps: int, k: int):
    """V-free embed: the round-1 kernel accumulated V through every one of
    the 140 sweep rotations (~840 full-width vector ops — a third of the
    kernel's VMEM traffic, which is what bounds it). This variant never
    accumulates V. Instead:

      C' = C + Σ_{j<k} u_j · sws_j · v̂_jᵀ,   v̂_j = G0ᵀ u_j / s_j

    which is EXACT for the identity part (the round-1 form U·S'·Vᵀ only
    reproduced C up to Jacobi convergence error) and needs V only for the
    k masked components. Output pixels are x + idct(delta). Degenerate
    blocks (s_j ≈ 0, e.g. flat regions) get a relative clamp on 1/s_j so
    v̂ attenuates to ~0 instead of blowing up — the same graceful "no mark
    in dead components" behavior the recon form exhibits via u→0.
    """
    d = _dct_matrix_np(B).tolist()

    def kernel(x_ref, sws_ref, out_ref, sc_ref):
        x = x_ref[0]                                 # [R, 8(row), 8(col), Wb]
        xc = [x[:, :, c, :] for c in range(B)]
        g0 = _dct_cols(xc, d)                        # original coefficients
        u, s = _jacobi_cols_u(g0, sweeps)

        sws = sws_ref[0]                             # [R, 8, Wb] (α·mask·Sw)
        eps = s[0] * 1e-5 + 1e-30                    # relative clamp
        dcols = [None] * B
        for j in range(k):
            coef = sws[:, j, :] / jnp.maximum(s[j], eps)     # [R, Wb]
            for c in range(B):
                vjc = jnp.sum(g0[c] * u[j], axis=-2)         # (G0ᵀu_j)[c]
                term = u[j] * (coef * vjc)[..., None, :]
                dcols[c] = term if dcols[c] is None else dcols[c] + term
        y = _idct_cols(dcols, d)
        out_ref[0] = jnp.stack([xc[c] + y[c] for c in range(B)], axis=2)
        sc_ref[0] = jnp.stack(s, axis=1)             # [R, 8, Wb]

    return kernel


def _jacobi_cols_u(g0, sweeps):
    """One-sided Jacobi returning only (sorted U columns, sorted S) —
    same rotations as _jacobi_cols but with no V carried through the
    sweeps, which removes ~1/3 of the kernel's full-width traffic."""
    g = list(g0)
    norms = [jnp.sum(g[i] * g[i], axis=-2) for i in range(B)]

    def sweep(_, carry):
        g, norms = list(carry[0]), list(carry[1])
        for p, q in PAIRS:
            gp, gq = g[p], g[q]
            app, aqq = norms[p], norms[q]
            apq = jnp.sum(gp * gq, axis=-2)
            c, s = _rotation(app, aqq, apq)
            t = s / c
            norms[p] = app - t * apq
            norms[q] = aqq + t * apq
            c, s = c[..., None, :], s[..., None, :]
            g[p] = c * gp - s * gq
            g[q] = s * gp + c * gq
        return tuple(g), tuple(norms)

    g, _ = jax.lax.fori_loop(0, sweeps, sweep, (tuple(g), tuple(norms)))
    g = list(g)
    s = [jnp.sqrt(jnp.sum(g[i] * g[i], axis=-2)) for i in range(B)]
    u = [g[i] / jnp.maximum(s[i], 1e-30)[..., None, :] for i in range(B)]
    for i, j in _SORT_NET:
        swap = s[i] < s[j]
        si, sj = s[i], s[j]
        s[i] = jnp.where(swap, sj, si)
        s[j] = jnp.where(swap, si, sj)
        sw2 = swap[..., None, :]
        ui, uj = u[i], u[j]
        u[i] = jnp.where(sw2, uj, ui)
        u[j] = jnp.where(sw2, ui, uj)
    return u, s


def _make_spectrum_kernel(sweeps: int):
    # Values-only one-sided Jacobi. (A two-sided Jacobi on the Gram matrix
    # A=GᵀG — fewer ops, no reductions — was prototyped and measured
    # SLOWER on v5e (36.5 vs 32 ms for 777k blocks): the kernel is bound by
    # serialized vector-op retire rate, not op mix, so the simpler
    # formulation that shares _jacobi_cols with the embed kernel wins.)
    d = _dct_matrix_np(B).tolist()

    def kernel(x_ref, s_ref):
        x = x_ref[0]
        xc = [x[:, :, c, :] for c in range(B)]
        coefs = _dct_cols(xc, d)
        s = _jacobi_cols(coefs, sweeps, compute_uv=False)
        s_ref[0] = jnp.stack(s, axis=1)              # [R, 8, Wb]

    return kernel


def _plane_cols_view(planes: jax.Array):
    """[..., H, W] f32 -> [P, Hb, 8(row), 8(col), Wb].

    Lane dim must be the wide one: a trailing dim of 8 gets padded to the
    128-lane vreg width (16× VMEM bloat — observed as a scoped-vmem OOM), so
    the block-column axis moves inward and Wb rides the lanes. The swap is
    one XLA transpose fused with the surrounding cast/epilogue.
    """
    *lead, h, w = planes.shape
    if h % B or w % B:
        raise ValueError("plane dims must be multiples of 8 (pad first)")
    p = 1
    for dim in lead:
        p *= dim
    hb, wb = h // B, w // B
    view = planes.reshape(p, hb, B, wb, B)
    return jnp.swapaxes(view, 3, 4), tuple(lead), hb, wb


def _rows_per_cell(hb: int, wb: int) -> int:
    """Block rows per grid cell: every VPU op in the kernel works on an
    [R, 8, Wb] value, so bigger R amortizes instruction-issue overhead;
    cap R·Wb to bound the kernel's VMEM live set (~25 such values)."""
    best = 1
    for r in range(1, hb + 1):
        if hb % r == 0 and r * wb <= 2400:
            best = r
    return best


@functools.partial(jax.jit, static_argnames=("sweeps", "rows", "interpret",
                                              "k", "variant"))
def embed_plane_blocks(planes: jax.Array, sws_scaled: jax.Array,
                       sweeps: int = _SWEEPS_DEFAULT,
                       rows: int | None = None,
                       interpret: bool = False,
                       k: int = B, variant: str = "delta"):
    """Fused blocked embed over f32 planes.

    planes:     [..., H, W] f32 (leading dims = batch/channels, flattened to
                the grid; for color pass [B, 3, H, W] so channel is the
                fastest-varying lead dim)
    sws_scaled: [C, N, 8] pre-scaled watermark SVs (α·mask·Sw), C must
                divide the flattened lead size and is indexed by plane % C
                (C=1 gray, C=3 per-channel color).
    k:          number of leading singular components carrying the mark
                (rows of sws_scaled beyond k must be zero; the delta variant
                only computes those k rank-1 terms).
    variant:    'delta' (V-free, see _make_embed_kernel_delta) or 'recon'
                (round-1 full U·S'·Vᵀ form, kept for A/B comparison).
    Returns (marked [..., H, W] f32, sc [..., N, 8]).
    """
    view, lead, hb, wb = _plane_cols_view(planes)
    p = view.shape[0]
    c = sws_scaled.shape[0]
    sws_v = jnp.swapaxes(sws_scaled.reshape(c, hb, wb, B), 2, 3)
    r = rows or _rows_per_cell(hb, wb)

    grid = (p, hb // r)
    kernel = (_make_embed_kernel_delta(sweeps, k) if variant == "delta"
              else _make_embed_kernel(sweeps))
    out_shape = (
        jax.ShapeDtypeStruct(view.shape, planes.dtype),
        jax.ShapeDtypeStruct((p, hb, B, wb), planes.dtype),
    )
    marked_v, sc = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, B, B, wb), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, B, wb), lambda i, j: (i % c, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, r, B, B, wb), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, B, wb), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape, interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
        )(view, sws_v)
    marked = jnp.swapaxes(marked_v, 3, 4).reshape(*lead, hb * B, wb * B)
    sc_b = jnp.swapaxes(sc, 2, 3).reshape(*lead, hb * wb, B)
    return marked, sc_b


@functools.partial(jax.jit, static_argnames=("sweeps", "rows", "interpret"))
def spectrum_plane_blocks(planes: jax.Array,
                          sweeps: int = _SWEEPS_DEFAULT,
                          rows: int | None = None,
                          interpret: bool = False) -> jax.Array:
    """Fused DCT + values-only Jacobi: [..., H, W] f32 -> [..., N, 8]."""
    view, lead, hb, wb = _plane_cols_view(planes)
    p = view.shape[0]
    r = rows or _rows_per_cell(hb, wb)
    grid = (p, hb // r)
    kernel = _make_spectrum_kernel(sweeps)
    s = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((1, r, B, B, wb),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, B, wb), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, hb, B, wb), planes.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
        )(view)
    return jnp.swapaxes(s, 2, 3).reshape(*lead, hb * wb, B)
