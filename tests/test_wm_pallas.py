"""Fused Pallas watermark kernels (ops/wm_pallas.py) vs the XLA composition,
in interpret mode on CPU. On-hardware agreement was verified on a real v5e
chip (marked/sc/spectrum all within 6e-7 relative)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dctsvd_tpu.ops import dct, svd, wm_pallas


@pytest.fixture(scope="module")
def data(rng):
    bb, h, w = 2, 64, 80
    n = (h // 8) * (w // 8)
    planes = jnp.asarray(
        rng.standard_normal((bb, 3, h, w)).astype(np.float32) * 50 + 128)
    sws = jnp.asarray((rng.standard_normal((3, n, 8)) ** 2)
                      .astype(np.float32))
    return planes, sws, h, w, n


def test_embed_matches_xla(data):
    planes, sws, h, w, n = data
    coefs = dct.dct2_plane_blocks(planes)
    u, s, vt = svd.jacobi_svd(coefs, compute_uv=True)
    s2 = s + jnp.broadcast_to(sws, s.shape)
    cw = jnp.einsum("...nij,...nj,...njk->...nik", u, s2, vt)
    ref = np.asarray(dct.idct2_blocks_to_plane(cw, h, w))

    marked, sc = wm_pallas.embed_plane_blocks(planes, sws, interpret=True)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(marked) / scale, ref / scale,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(s),
                               rtol=0, atol=2e-4 * float(np.asarray(s).max()))


def test_embed_delta_variant_matches_recon(data):
    """The V-free delta kernel must agree with the round-1 recon kernel
    (identical rotations/S; marked planes differ only by Jacobi
    convergence error in how the identity part is reproduced)."""
    planes, sws, h, w, n = data
    m_rec, sc_rec = wm_pallas.embed_plane_blocks(planes, sws,
                                                 variant="recon",
                                                 interpret=True)
    m_del, sc_del = wm_pallas.embed_plane_blocks(planes, sws,
                                                 variant="delta",
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(sc_rec), np.asarray(sc_del))
    scale = float(np.abs(np.asarray(m_rec)).max())
    np.testing.assert_allclose(np.asarray(m_del) / scale,
                               np.asarray(m_rec) / scale, atol=2e-5)


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
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * ref.max())


def test_rows_batching_equivalent(data):
    planes, sws, _, _, _ = data
    m1, sc1 = wm_pallas.embed_plane_blocks(planes, sws, rows=1,
                                           interpret=True)
    m2, sc2 = wm_pallas.embed_plane_blocks(planes, sws, rows=4,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(sc1), np.asarray(sc2))


def test_gray_shared_sws(data):
    """C=1 watermark broadcast over a [B, H, W] gray batch."""
    planes, sws, h, w, n = data
    gray = planes[:, 0]
    m, sc = wm_pallas.embed_plane_blocks(gray, sws[:1], interpret=True)
    coefs = dct.dct2_plane_blocks(gray)
    u, s, vt = svd.jacobi_svd(coefs, compute_uv=True)
    cw = jnp.einsum("...nij,...nj,...njk->...nik", u,
                    s + jnp.broadcast_to(sws[0], s.shape), vt)
    ref = np.asarray(dct.idct2_blocks_to_plane(cw, h, w))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(m) / scale, ref / scale,
                               atol=2e-5)
