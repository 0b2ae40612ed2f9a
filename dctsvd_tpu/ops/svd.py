"""SVD on TPU: full-frame wrapper + batched one-sided Jacobi kernel.

The reference's hot op is ``np.linalg.svd`` of the whole-frame DCT matrix —
3.37 s for 1080×1920 on its CPU, >90 % of embed runtime (SURVEY.md §3.1,
ref: app_dct_svd_single.py:172-173). Two device strategies here:

  - :func:`svd_full` — whole-frame SVD for the parity path. XLA's qdwh-based
    ``jnp.linalg.svd`` runs on-device (~43 ms for 1080×1920 f32 on v5e).
  - :func:`jacobi_svd` — batched one-sided (Hestenes) Jacobi over
    ``[..., N, m, n]`` tensors of small matrices (the blocked path's
    [N, 8, 8] DCT blocks). One-sided Jacobi is the right algorithm on TPU:
    a *fixed* number of sweeps of statically-unrolled column-pair rotations,
    no data-dependent control flow, everything vectorized over the batch.
    ``jnp.linalg.svd`` on the same [32400, 8, 8] batch takes ~485 ms; this
    kernel is pure VPU elementwise work over the batch axis.

Matrices are processed in "column-major stack" layout ``[n, ..., m]`` so each
column update is a static-index slice of the leading axis — XLA turns these
into cheap in-register updates, and the batch axis stays on lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def svd_full(x: jax.Array, compute_uv: bool = True):
    """Full-matrix thin SVD (U, S, Vt) of the trailing two axes.

    ``compute_uv=False`` still runs the full decomposition and returns S:
    XLA's values-only SVD is a *different* graph whose singular values differ
    from the full path at f32 ulp level, and detect/extract divide
    ``S_stego − Sc`` by alpha — on an unmodified image that difference must
    be exactly zero against the meta's stored Sc (the reference's LAPACK
    gesdd is bitwise-identical across jobz modes, so it gets this for free;
    ref: app_dct_svd_single.py:205,297).
    """
    u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    if compute_uv:
        return u, s, vt
    return s


def _rotation(app: jax.Array, aqq: jax.Array, apq: jax.Array):
    """Stable Jacobi rotation (c, s) zeroing the (p,q) off-diagonal of the
    implicit Gram matrix. All inputs are batched [...]."""
    eps = jnp.asarray(1e-30, app.dtype)
    denom = 2.0 * apq
    safe = jnp.abs(denom) > eps
    zeta = jnp.where(safe, (aqq - app) / jnp.where(safe, denom, 1.0), 0.0)
    # sign(0) must be +1 here: zeta == 0 with apq != 0 means parallel columns
    # of equal norm, whose correct rotation is 45 deg (t = 1), not identity.
    sgn = jnp.where(zeta >= 0, 1.0, -1.0).astype(zeta.dtype)
    t = sgn / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    t = jnp.where(safe, t, 0.0)
    c = jax.lax.rsqrt(1.0 + t * t)
    s = c * t
    return c, s


def jacobi_svd(a: jax.Array, sweeps=5, compute_uv: bool = True,
               sort_descending: bool = True, impl: str = "auto"):
    """Batched one-sided Jacobi SVD of [..., m, n] with m >= n small (≤ 32).

    Returns (U [..., m, n], S [..., n], Vt [..., n, n]) with S >= 0 sorted
    descending, or just S when ``compute_uv=False``.

    ``impl``: 'pallas' (VMEM-resident TPU kernel, ops/svd_pallas.py),
    'xla' (portable formulation below), or 'auto' (pallas on TPU backends,
    xla elsewhere; override with env DCTSVD_SVD_IMPL).

    Accuracy: converged at f32 by 5 cyclic sweeps on both DCT blocks and
    random Gaussian 8×8 (measured vs LAPACK; tests/test_svd.py). Fixed
    sweep count -> fully static graph.
    """
    import os
    if impl == "auto":
        impl = os.environ.get("DCTSVD_SVD_IMPL", "")
    if not impl or impl == "auto":
        impl = ("pallas" if jax.default_backend() in ("tpu", "axon")
                else "xla")
    # The Pallas kernel's ordering network (svd_pallas._SORT_NET) is built
    # for exactly n == 8: larger n would return S silently UNSORTED past
    # index 7 and smaller n would IndexError at trace time — either way a
    # contract break ("S sorted descending" for any n <= 32). Other sizes
    # take the XLA formulation, which sorts for arbitrary n.
    if impl == "pallas" and sort_descending and a.shape[-1] == 8:
        from dctsvd_tpu.ops.svd_pallas import jacobi_svd_pallas
        return jacobi_svd_pallas(a, sweeps=sweeps, compute_uv=compute_uv)
    return _jacobi_svd_xla(a, sweeps=sweeps, compute_uv=compute_uv,
                           sort_descending=sort_descending)


@functools.partial(jax.jit, static_argnames=("sweeps", "compute_uv",
                                             "sort_descending"))
def _jacobi_svd_xla(a: jax.Array, sweeps=5, compute_uv: bool = True,
                    sort_descending: bool = True):
    """Portable XLA formulation (CPU tests, non-TPU backends)."""
    *batch, m, n = a.shape
    if n > m:
        raise ValueError("jacobi_svd requires m >= n (pass a transposed).")
    dtype = a.dtype
    bsz = 1
    for d in batch:
        bsz *= d

    # Layout [n, m, B]: the batch lives on the lane axis so every column op
    # is a [m, B] elementwise tile with full 128-lane utilization; column
    # index n is the leading axis so g[p] is a static slice.
    g = jnp.transpose(a.reshape(bsz, m, n), (2, 1, 0))   # [n, m, B]
    if compute_uv:
        # init from g (not a bare constant) so the scan carry keeps the same
        # varying-manual-axes type under shard_map
        v = jnp.eye(n, dtype=dtype)[:, :, None] + 0.0 * g[:, :n, :]
    else:
        v = None

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    # Rutishauser norm caching (see ops/wm_pallas.py): one reduction per
    # pair instead of three; norms update algebraically.
    norms = jnp.sum(g * g, axis=1)                   # [n, B]

    def rotate(g, norms, v, rot_pairs):
        for p, q in rot_pairs:
            gp, gq = g[p], g[q]                      # [m, B]
            app, aqq = norms[p], norms[q]
            apq = jnp.sum(gp * gq, axis=0)           # [B]
            c, s = _rotation(app, aqq, apq)          # [B]
            t = s / c
            norms = norms.at[p].set(app - t * apq)
            norms = norms.at[q].set(aqq + t * apq)
            g = g.at[p].set(c * gp - s * gq)
            g = g.at[q].set(s * gp + c * gq)
            if v is not None:
                vp, vq = v[p], v[q]
                v = v.at[p].set(c * vp - s * vq)
                v = v.at[q].set(s * vp + c * vq)
        return g, norms, v

    def sweep(carry, _):
        g, norms, v = carry
        return rotate(g, norms, v, pairs), None

    # Fractional sweep counts replay the fused kernels' pair-grid
    # schedules (ops/wm_pallas._schedule): ``full`` whole cyclic sweeps
    # plus the first ``extra`` pairs of the next — same prefix of the
    # same cyclic order, so a fractional-tier TPU embed extracted on
    # this fallback keeps the (s_cw − sc) residual cancellation exact.
    full_sweeps = int(sweeps)
    extra = int(round((float(sweeps) - full_sweeps) * len(pairs)))
    full_sweeps += extra // len(pairs)
    extra %= len(pairs)

    (g, norms, v), _ = jax.lax.scan(sweep, (g, norms, v), None,
                                    length=full_sweeps)
    if extra:
        g, norms, v = rotate(g, norms, v, pairs[:extra])

    s = jnp.sqrt(jnp.sum(g * g, axis=1))            # [n, B]
    s_bn = jnp.moveaxis(s, 0, -1).reshape(*batch, n)

    if not compute_uv and not sort_descending:
        return s_bn
    if not compute_uv:
        return jnp.sort(s_bn, axis=-1)[..., ::-1]

    # U columns = G columns / sigma (guard zero columns)
    denom = jnp.where(s > 1e-30, s, 1.0)[:, None, :]
    u = g / denom                                   # [n, m, B]
    u_b = jnp.transpose(u, (2, 1, 0)).reshape(*batch, m, n)
    # v[p] holds V's column p => transposing (col, row, B) -> (B, col, row)
    # yields exactly Vt (row p of Vt = column p of V).
    vt_b = jnp.transpose(v, (2, 0, 1)).reshape(*batch, n, n)

    if sort_descending:
        order = jnp.argsort(-s_bn, axis=-1)         # [..., n]
        s_bn = jnp.take_along_axis(s_bn, order, axis=-1)
        u_b = jnp.take_along_axis(u_b, order[..., None, :], axis=-1)
        vt_b = jnp.take_along_axis(vt_b, order[..., :, None], axis=-2)
    return u_b, s_bn, vt_b


def jacobi_singular_values(a: jax.Array, sweeps=5) -> jax.Array:
    """Values-only variant (detect path — no U/V accumulation, ~40 % cheaper;
    SURVEY.md §3.3)."""
    return jacobi_svd(a, sweeps=sweeps, compute_uv=False)
