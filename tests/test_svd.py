import numpy as np
import pytest

from dctsvd_tpu.ops import svd


@pytest.fixture()
def rng():
    # Local deterministic stream, NOT the session-scoped conftest rng:
    # these tests assert tight numeric tolerances, and drawing from a
    # shared stream makes them depend on which tests ran before them.
    return np.random.default_rng(20260817)


def test_jacobi_values_match_lapack(rng):
    a = rng.normal(size=(50, 8, 8)).astype(np.float32)
    s_ref = np.linalg.svd(a, compute_uv=False)
    s_ours = np.asarray(svd.jacobi_singular_values(a))
    np.testing.assert_allclose(s_ours, s_ref, rtol=2e-5, atol=1e-4)


def test_jacobi_full_reconstruction(rng):
    a = rng.normal(size=(50, 8, 8)).astype(np.float32) * 10
    u, s, vt = svd.jacobi_svd(a)
    u, s, vt = np.asarray(u), np.asarray(s), np.asarray(vt)
    rec = np.einsum("nij,nj,njk->nik", u, s, vt)
    np.testing.assert_allclose(rec, a, atol=2e-4)
    # orthogonality
    utu = np.einsum("nij,nik->njk", u, u)
    vvt = np.einsum("nij,nkj->nik", vt, vt)
    eye = np.broadcast_to(np.eye(8, dtype=np.float32), (50, 8, 8))
    np.testing.assert_allclose(utu, eye, atol=2e-4)
    np.testing.assert_allclose(vvt, eye, atol=2e-4)
    # descending order, non-negative
    assert (s >= 0).all()
    assert (np.diff(s, axis=-1) <= 1e-4).all()


def test_jacobi_rectangular(rng):
    a = rng.normal(size=(10, 16, 8)).astype(np.float32)
    u, s, vt = svd.jacobi_svd(a)
    rec = np.einsum("nij,nj,njk->nik", np.asarray(u), np.asarray(s),
                    np.asarray(vt))
    np.testing.assert_allclose(rec, a, atol=2e-4)
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-5, atol=1e-4)


def test_jacobi_degenerate_cases(rng):
    # rank-deficient + repeated singular values + zeros
    a = np.zeros((4, 8, 8), np.float32)
    a[1] = np.eye(8)
    a[2] = np.outer(np.arange(8), np.ones(8)).astype(np.float32)
    a[3, :4, :4] = rng.normal(size=(4, 4))
    s_ref = np.linalg.svd(a, compute_uv=False)
    s_ours = np.asarray(svd.jacobi_singular_values(a))
    np.testing.assert_allclose(s_ours, s_ref, rtol=1e-4, atol=1e-4)


def test_svd_full_wrapper(rng):
    a = rng.normal(size=(32, 48)).astype(np.float32)
    u, s, vt = svd.svd_full(a)
    rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(vt)
    np.testing.assert_allclose(rec, a, atol=1e-4)
    s_only = np.asarray(svd.svd_full(a, compute_uv=False))
    np.testing.assert_allclose(s_only, np.asarray(s), rtol=1e-5)


def test_pallas_kernel_matches_xla(rng):
    """The Pallas Jacobi (interpret mode on CPU) must agree with the XLA
    formulation and LAPACK."""
    from dctsvd_tpu.ops.svd_pallas import jacobi_svd_pallas
    a = rng.normal(size=(200, 8, 8)).astype(np.float32) * 3
    u, s, vt = jacobi_svd_pallas(a, interpret=True, tile=128)
    rec = np.einsum("nij,nj,njk->nik", np.asarray(u), np.asarray(s),
                    np.asarray(vt))
    np.testing.assert_allclose(rec, a, atol=2e-4)
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-5, atol=1e-4)
    s_only = jacobi_svd_pallas(a, compute_uv=False, interpret=True,
                               tile=128)
    np.testing.assert_allclose(np.asarray(s_only), s_ref, rtol=2e-5,
                               atol=1e-4)


def test_jacobi_impl_dispatch(rng):
    a = rng.normal(size=(10, 8, 8)).astype(np.float32)
    s_x = np.asarray(svd.jacobi_svd(a, compute_uv=False, impl="xla"))
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(s_x, s_ref, rtol=2e-5, atol=1e-4)
