"""Fused Pallas watermark kernels (ops/wm_pallas.py) vs the XLA composition,
in interpret mode on CPU. On-hardware agreement was verified on a real v5e
chip (marked/sc/spectrum all within 6e-7 relative)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import dct, svd, wm_pallas


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """Serializing this module's interpret-mode Pallas executables for the
    persistent compile cache segfaults XLA:CPU when the process has the
    full suite's compilation state behind it (reproducible at
    test_roundtrip_matches_split: SIGSEGV in put_executable_and_time on
    write, SIGABRT in get_executable_and_time re-reading a poisoned
    entry; the same tests pass standalone). Toolchain bug — keep these
    executables out of the on-disk cache entirely. Costs ~2 min of
    re-compiles per cold run for this file only.

    The enable flag alone is NOT enough: jax freezes its use-the-cache
    decision at the first compile of the process (is_cache_used's
    _cache_checked latch) — reset_cache() clears the latch so the flag
    flip actually takes effect, both on entry and on restore."""
    from jax._src import compilation_cache as cc
    jax.config.update("jax_enable_compilation_cache", False)
    cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()


@pytest.fixture(scope="module")
def data():
    # own fixed-seed generator (NOT the shared session rng): the spectral
    # tolerances here are calibrated against a specific draw, and the
    # session rng's stream position depends on which tests ran before.
    rng = np.random.default_rng(20260816)
    bb, h, w = 2, 64, 80
    n = (h // 8) * (w // 8)
    planes = jnp.asarray(
        rng.standard_normal((bb, 3, h, w)).astype(np.float32) * 50 + 128)
    sws = jnp.asarray((rng.standard_normal((3, n, 8)) ** 2)
                      .astype(np.float32))
    return planes, sws, h, w, n


def test_embed_matches_xla(data):
    """Scheme-level invariants of the fused embed vs the XLA oracle.

    The kernel runs Jacobi on the PIXEL block (orthogonal invariance —
    ops/wm_pallas.py module docstring), so inside (near-)degenerate
    singular subspaces it may paint the spread along a different (equally
    valid) orthonormal basis than the DCT-domain oracle — the marked
    planes are not bitwise comparable there. What the scheme actually
    guarantees, and what extraction/detection consume, is spectral:

      1. sc returned = cover block singular values,
      2. spectrum(marked) = sc + sws  (the additive spread rule),
      3. per-block delta energy: ||marked - cover||_F = ||sws||_2
         (orthonormal rank-1 directions), so no stray energy anywhere.
    """
    planes, sws, h, w, n = data
    coefs = dct.dct2_plane_blocks(planes)
    s = svd.jacobi_svd(coefs, compute_uv=False)
    smax = float(np.asarray(s).max())

    marked, sc = wm_pallas.embed_plane_blocks(planes, sws, interpret=True)
    # 1e-3·smax: the kernel runs the production sweep count (4); random
    # Gaussian blocks have clustered trailing values that need a 5th sweep
    # for 2e-4 agreement with the oracle. 4-sweep residual is ~6e-4 rel on
    # a couple of clustered components — immaterial end-to-end (measured
    # identical quality at sweeps 3/4/5, see ops/wm_pallas.py).
    np.testing.assert_allclose(np.asarray(sc), np.asarray(s),
                               rtol=0, atol=1e-3 * smax)

    s_marked = svd.jacobi_svd(dct.dct2_plane_blocks(marked),
                              compute_uv=False)
    expect = np.asarray(s) + np.asarray(jnp.broadcast_to(sws, s.shape))
    # spread rule holds exactly only outside degenerate clusters; within a
    # cluster the painted directions differ but the SUM of the cluster's
    # singular values is still preserved -> compare top-of-block partial
    # sums (majorization-stable) plus the well-separated leading value
    np.testing.assert_allclose(np.asarray(s_marked)[..., 0],
                               expect[..., 0], rtol=0, atol=2e-4 * smax)
    # 1% relative: inside a near-degenerate cluster the spread lands along
    # a slightly rotated basis, which changes the nuclear norm by
    # O(sws_j), not O(convergence) — the hard energy invariant is the
    # Frobenius check below (rank-1 directions are orthonormal exactly).
    np.testing.assert_allclose(
        np.cumsum(np.sort(np.asarray(s_marked), axis=-1)[..., ::-1],
                  axis=-1)[..., -1],
        np.cumsum(np.sort(expect, axis=-1)[..., ::-1], axis=-1)[..., -1],
        rtol=1e-2, atol=0)

    delta = np.asarray(marked) - np.asarray(planes)
    dview = delta.reshape(*delta.shape[:-2], h // 8, 8, w // 8, 8)
    energy = np.sqrt((dview ** 2).sum(axis=(-3, -1))
                     ).reshape(*delta.shape[:-2], -1)       # [bb, 3, N]
    sws_energy = np.sqrt((np.asarray(sws) ** 2).sum(-1))    # [3, N]
    np.testing.assert_allclose(energy, np.broadcast_to(
        sws_energy, energy.shape), rtol=5e-3, atol=1e-2 * smax)


def test_embed_delta_variant_matches_recon(data):
    """The V-free delta kernel must agree with the recon kernel under the
    PRODUCTION masking (k=4 leading components): both run the same
    rotations (S bit-identical) and the leading singular directions of
    natural-scale random blocks are well separated, so the accumulated-V
    recon and the delta's exact v̂_j = Xᵀu_j/s_j coincide to convergence
    error. (With unmasked sws the trailing ill-conditioned components
    amplify 1/s_j and the two valid spreads diverge — not a production
    configuration.)"""
    planes, sws, h, w, n = data
    mask = (np.arange(8) < 4).astype(np.float32)
    sws_m = sws * mask
    m_rec, sc_rec = wm_pallas.embed_plane_blocks(planes, sws_m,
                                                 variant="recon",
                                                 interpret=True)
    m_del, sc_del = wm_pallas.embed_plane_blocks(planes, sws_m, k=4,
                                                 variant="delta",
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(sc_rec), np.asarray(sc_del))
    scale = float(np.abs(np.asarray(m_rec)).max())
    np.testing.assert_allclose(np.asarray(m_del) / scale,
                               np.asarray(m_rec) / scale, atol=1e-4)


def test_embed_delta_masked_k(data):
    """With rows >= k zeroed in sws (the production masking), computing
    only k delta terms is exact."""
    planes, sws, h, w, n = data
    mask = (np.arange(8) < 4).astype(np.float32)
    sws_m = sws * mask
    m8, sc8 = wm_pallas.embed_plane_blocks(planes, sws_m, k=8,
                                           interpret=True)
    m4, sc4 = wm_pallas.embed_plane_blocks(planes, sws_m, k=4,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(sc8), np.asarray(sc4))
    scale = float(np.abs(np.asarray(m8)).max())
    np.testing.assert_allclose(np.asarray(m4) / scale,
                               np.asarray(m8) / scale, atol=1e-6)


def test_spectrum_matches_xla(data):
    planes, _, _, _, _ = data
    coefs = dct.dct2_plane_blocks(planes)
    ref = np.asarray(svd.jacobi_svd(coefs, compute_uv=False))
    got = np.asarray(wm_pallas.spectrum_plane_blocks(planes,
                                                     interpret=True))
    # 1e-3: production sweep count (4) leaves ~6e-4 rel residual on
    # clustered components of random Gaussian blocks (same rationale as
    # test_embed_matches_xla).
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=1e-3 * ref.max())


def test_spectrum_replay_cross_path(data):
    """Cross-backend sweep replay: the XLA fallback replays a fused
    embed's PARTIAL schedule by running svd.jacobi_svd on the same PIXEL
    blocks with the meta's sweep count (models/blocked._plane_spectrum).
    At sweeps=2 the pixel-domain replay must track the kernel to rounding
    level, while the converged DCT-domain spectrum (the pre-fix fallback)
    differs by the partial-convergence residual — the un-cancelled error
    the sweep-replay machinery exists to remove."""
    planes, _, _, _, _ = data
    kern = np.asarray(wm_pallas.spectrum_plane_blocks(planes, sweeps=2,
                                                      interpret=True))
    replay = np.asarray(svd.jacobi_svd(dct.blockify(planes), sweeps=2,
                                       compute_uv=False))
    converged = np.asarray(svd.jacobi_svd(dct.dct2_plane_blocks(planes),
                                          compute_uv=False))
    np.testing.assert_allclose(replay, kern, rtol=0,
                               atol=5e-4 * kern.max())
    replay_err = np.abs(replay - kern).max()
    resid = np.abs(converged - kern).max()
    assert replay_err < 0.2 * resid, (replay_err, resid)

    from dctsvd_tpu.models import blocked as m_blocked
    got = np.asarray(m_blocked._plane_spectrum(planes, sweeps=2))
    if m_blocked._use_fused():
        # TPU / DCTSVD_FUSED=1 runs: the dispatch goes to the hardware
        # kernel, which matches the XLA replay only to rounding level
        np.testing.assert_allclose(got, replay, rtol=0,
                                   atol=5e-4 * kern.max())
    else:
        np.testing.assert_array_equal(got, replay)

    # meta.sweeps=0 (converged XLA embed) must NEVER reach the fused
    # kernel raw — a 0-sweep fori_loop returns unrotated column norms.
    # Both spectrum entry points map it to the near-converged default.
    s_plane = np.asarray(m_blocked._plane_spectrum(planes, sweeps=0))
    np.testing.assert_allclose(s_plane, converged, rtol=0,
                               atol=2e-3 * converged.max())
    frames = jnp.moveaxis(jnp.asarray(planes), -3, -1)  # [B, H, W, C]
    s_frames = np.asarray(m_blocked._frames_spectrum(frames, sweeps=0))
    np.testing.assert_allclose(s_frames, converged, rtol=0,
                               atol=2e-3 * converged.max())


def test_rows_batching_equivalent(data):
    planes, sws, _, _, _ = data
    m1, sc1 = wm_pallas.embed_plane_blocks(planes, sws, rows=1,
                                           interpret=True)
    m2, sc2 = wm_pallas.embed_plane_blocks(planes, sws, rows=4,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc2))


def test_gray_shared_sws(data):
    """C=1 watermark broadcast over a [B, H, W] gray batch: the i % C sws
    indexing must hand every plane the same watermark — kernel-vs-kernel
    exact equality against an explicit per-plane layout, plus the spread
    rule on the leading singular value."""
    planes, sws, h, w, n = data
    gray = planes[:, 0]
    m, sc = wm_pallas.embed_plane_blocks(gray, sws[:1], interpret=True)
    m2, sc2 = wm_pallas.embed_plane_blocks(gray[:, None], sws[:1],
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2)[:, 0])
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc2)[:, 0])

    s = svd.jacobi_svd(dct.dct2_plane_blocks(gray), compute_uv=False)
    smax = float(np.asarray(s).max())
    s_m = svd.jacobi_svd(dct.dct2_plane_blocks(m), compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(s_m)[..., 0],
        np.asarray(s)[..., 0] + np.asarray(sws)[0, :, 0],
        rtol=0, atol=2e-4 * smax)


def test_u8_planes_in(data):
    """u8 planes widen inside the fused view transpose; results must match
    feeding the same values as f32 (the serving extract/detect path hands
    the kernels u8 stego planes directly)."""
    planes, sws, h, w, n = data
    p_u8 = jnp.clip(planes, 0, 255).astype(jnp.uint8)
    p_f32 = p_u8.astype(jnp.float32)
    m_u, sc_u = wm_pallas.embed_plane_blocks(p_u8, sws, interpret=True)
    m_f, sc_f = wm_pallas.embed_plane_blocks(p_f32, sws, interpret=True)
    assert m_u.dtype == jnp.float32 and sc_u.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(m_u), np.asarray(m_f))
    np.testing.assert_array_equal(np.asarray(sc_u), np.asarray(sc_f))
    s_u = wm_pallas.spectrum_plane_blocks(p_u8, interpret=True)
    s_f = wm_pallas.spectrum_plane_blocks(p_f32, interpret=True)
    assert s_u.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(s_u), np.asarray(s_f))


def test_embed_out_u8(data):
    """out_u8 must equal the XLA clip+cast epilogue bit-for-bit."""
    planes, sws, h, w, n = data
    m_f, sc_f = wm_pallas.embed_plane_blocks(planes, sws, k=4,
                                             interpret=True)
    m_u, sc_u = wm_pallas.embed_plane_blocks(planes, sws, k=4,
                                             out_u8=True, interpret=True)
    assert m_u.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(sc_u), np.asarray(sc_f))
    np.testing.assert_array_equal(
        np.asarray(m_u),
        np.asarray(jnp.clip(m_f, 0, 255).astype(jnp.uint8)))


def test_bf16_storage_close_to_f32(data):
    """bf16 sweep-column storage (the register-pressure variant,
    VERDICT r2 #1b): spectra agree with f32 storage to bf16 rounding
    (~0.4% relative), and the embed's marked plane stays within ~1 gray
    level. The end-to-end quality gate for defaulting it is the 4K
    robustness bench on hardware; this pins the numeric contract."""
    planes, sws, h, w, n = data
    s0 = wm_pallas.spectrum_plane_blocks(planes, interpret=True)
    s1 = wm_pallas.spectrum_plane_blocks(planes, interpret=True, bf16=True)
    smax = float(np.asarray(s0).max())
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=0, atol=0.01 * smax)

    m0, sc0 = wm_pallas.embed_plane_blocks(planes, sws, k=4,
                                           interpret=True)
    m1, sc1 = wm_pallas.embed_plane_blocks(planes, sws, k=4,
                                           interpret=True, bf16=True)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc0),
                               rtol=0, atol=0.01 * smax)
    assert float(jnp.max(jnp.abs(m1 - m0))) < 2.0


def test_channels_last_matches_plane_path(data):
    """channels_last=True (decode-layout frames, fused rank-6 view) must
    equal the channel-first plane path bit-for-bit: same kernel, same
    plane order (channel fastest-varying), only the HBM layout differs."""
    planes, sws, h, w, n = data
    frames_u8 = jnp.clip(planes, 0, 255).astype(jnp.uint8)   # [B, 3, H, W]
    frames_hwc = jnp.moveaxis(frames_u8, -3, -1)             # [B, H, W, 3]

    m_p, sc_p = wm_pallas.embed_plane_blocks(frames_u8, sws, k=4,
                                             out_u8=True, interpret=True)
    m_f, sc_f = wm_pallas.embed_plane_blocks(frames_hwc, sws, k=4,
                                             out_u8=True,
                                             channels_last=True,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(jnp.moveaxis(m_f, -1, -3)),
                                  np.asarray(m_p))
    np.testing.assert_array_equal(np.asarray(sc_f), np.asarray(sc_p))

    s_p = wm_pallas.spectrum_plane_blocks(frames_u8, interpret=True)
    s_f = wm_pallas.spectrum_plane_blocks(frames_hwc, channels_last=True,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(s_f), np.asarray(s_p))


def test_roundtrip_matches_split(data):
    """roundtrip_frames_blocks == embed(channels_last, out_u8) followed by
    spectrum_plane_blocks on the produced stego, bit-exactly — the
    verification spectrum reads the embed kernel's view output, which is
    the same u8 bytes the stego re-view would produce."""
    planes, sws, h, w, n = data
    frames = jnp.clip(jnp.moveaxis(planes, -3, -1), 0, 255
                      ).astype(jnp.uint8)                 # [B, H, W, 3]
    stego, sc, s_cw = wm_pallas.roundtrip_frames_blocks(
        frames, sws, sweeps=2, k=4, interpret=True)
    m_split, sc_split = wm_pallas.embed_plane_blocks(
        frames, sws, sweeps=2, k=4, out_u8=True, channels_last=True,
        interpret=True)
    s_split = wm_pallas.spectrum_plane_blocks(
        m_split, sweeps=2, channels_last=True, interpret=True)
    assert stego.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(stego), np.asarray(m_split))
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc_split))
    np.testing.assert_array_equal(np.asarray(s_cw), np.asarray(s_split))


def test_explicit_rows_must_divide_hb(data):
    """An explicit rows that does not divide hb would leave the last
    hb % rows block rows of the output UNWRITTEN (the grid never visits
    them) — it must raise instead (code-review r3)."""
    planes, sws, _, _, _ = data           # 64x80 -> hb=8
    with pytest.raises(ValueError, match="divide"):
        wm_pallas.embed_plane_blocks(planes, sws, rows=3, interpret=True)
    with pytest.raises(ValueError, match="divide"):
        wm_pallas.spectrum_plane_blocks(planes, rows=5, interpret=True)


def test_fractional_schedule_math():
    """sched_split / sched_join: the pair-grid quantization fractional
    tiers serialize through (io/meta.py sweeps + sweeps_xpairs). Every
    representable schedule must round-trip exactly, integral schedules
    must stay ints (jit cache keys / meta bytes unchanged), and a
    fraction whose pair count rounds to a whole sweep promotes into the
    full count instead of silently dropping the 28th pair (advisor r4)."""
    P = len(wm_pallas.PAIRS)
    assert P == 28
    # exact round-trip over the whole representable grid
    for full in range(5):
        for xp in range(P):
            v = wm_pallas.sched_join(full, xp)
            assert wm_pallas.sched_split(v) == (full, xp), (full, xp, v)
    # integral schedules stay ints through join
    for n in range(5):
        j = wm_pallas.sched_join(n, 0)
        assert j == n and isinstance(j, int)
    # canonical tiers land on the intended pair counts
    assert wm_pallas.sched_split(1.25) == (1, 7)
    assert wm_pallas.sched_split(1.5) == (1, 14)
    assert wm_pallas.sched_split(1.75) == (1, 21)
    # whole-sweep promotion (advisor r4: 1.999 used to clamp to (1, 27))
    assert wm_pallas.sched_split(1.999) == (2, 0)
    assert wm_pallas.sched_split(2.0) == (2, 0)
    # join normalizes an un-normalized pair count the same way
    assert wm_pallas.sched_join(1, 28) == 2
    assert wm_pallas.sched_join(0, 42) == 1.5


def test_fractional_replay_cross_path(data):
    """The fractional-tier analog of test_spectrum_replay_cross_path:
    a sweeps=1.5 schedule (one full cyclic sweep + the first 14 pairs of
    the next) must replay IDENTICALLY across every Jacobi path — the
    fused one-sided kernel, the XLA fallback's pixel-block replay, and
    the Gram kernel — or a fractional-tier TPU embed extracted on a CPU
    host would leave exactly the un-cancelled residual the sweep
    machinery exists to remove (verdict r4 #1 / advisor r4)."""
    planes, _, _, _, _ = data
    kern = np.asarray(wm_pallas.spectrum_plane_blocks(planes, sweeps=1.5,
                                                      interpret=True))
    replay = np.asarray(svd.jacobi_svd(dct.blockify(planes), sweeps=1.5,
                                       compute_uv=False))
    np.testing.assert_allclose(replay, kern, rtol=0,
                               atol=5e-4 * kern.max())

    # the 1.5 schedule is genuinely BETWEEN s1 and s2 — not an alias of
    # either (both neighbors differ from it by far more than replay error)
    s1 = np.asarray(wm_pallas.spectrum_plane_blocks(planes, sweeps=1,
                                                    interpret=True))
    s2 = np.asarray(wm_pallas.spectrum_plane_blocks(planes, sweeps=2,
                                                    interpret=True))
    replay_err = np.abs(replay - kern).max()
    assert np.abs(s1 - kern).max() > 50 * max(replay_err, 1e-6)
    assert np.abs(s2 - kern).max() > 50 * max(replay_err, 1e-6)

    # Gram kernel runs the same rotation prefix (advisor r4: it used to
    # crash on fractional sweeps in fori_loop)
    gram = np.asarray(wm_pallas.spectrum_plane_blocks(
        planes, sweeps=1.5, method="gram", interpret=True))
    np.testing.assert_allclose(gram, kern, rtol=0, atol=5e-3 * kern.max())

    # the batched SVD kernel (ops/svd_pallas.py) follows the same prefix
    from dctsvd_tpu.ops import svd_pallas
    blocks = dct.blockify(planes)
    flat = np.asarray(blocks).reshape(-1, 8, 8)
    _, s_pal, _ = svd_pallas.jacobi_svd_pallas(flat, sweeps=1.5,
                                               interpret=True)
    _, s_xla, _ = svd._jacobi_svd_xla(jnp.asarray(flat), sweeps=1.5)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_xla),
                               rtol=0, atol=5e-4 * kern.max())


def test_fractional_embed_extract_cancellation(data):
    """End-to-end additive-spread cancellation at a fractional tier: embed
    at sweeps=1.5, read the marked spectrum back at sweeps=1.5 — the
    partial-convergence residual (huge at 1.5 sweeps on these clustered
    Gaussian blocks) largely cancels in (s_cw − sc), while a CONVERGED
    read of the same marked planes (the pre-replay-machinery fallback
    behavior) leaves it: measured rms 2.2 matched vs 10.8 converged-read
    on this draw. That asymmetry IS the replay contract; the absolute
    residual floor is content-dependent (degenerate clusters), which is
    why the bound is relative, not absolute."""
    planes, sws, h, w, n = data
    marked, sc = wm_pallas.embed_plane_blocks(planes, sws, sweeps=1.5,
                                              interpret=True)
    want = np.asarray(jnp.broadcast_to(sws, np.asarray(sc).shape))

    def read_err(read_sweeps):
        s_cw = np.asarray(wm_pallas.spectrum_plane_blocks(
            marked, sweeps=read_sweeps, interpret=True))
        e = (s_cw - np.asarray(sc)) - want
        return np.sqrt((e ** 2).mean())

    rms_matched = read_err(1.5)
    rms_converged = read_err(5)
    assert rms_matched < 0.35 * rms_converged, (rms_matched, rms_converged)
