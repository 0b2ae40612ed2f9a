"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4.4). Verifies the sharded graphs compile, execute, and agree
with their single-device counterparts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dctsvd_tpu.models import blocked
from dctsvd_tpu.parallel import batch as pbatch
from dctsvd_tpu.parallel import mesh as mesh_lib
from dctsvd_tpu.utils import crypto


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(8)


def test_mesh_shapes(mesh8):
    assert mesh8.axis_names == (mesh_lib.BATCH_AXIS,)
    assert mesh8.devices.size == 8


def _indices(key, h, w):
    blk, intra = crypto.block_permutation_indices(key,
                                                  blocked.n_blocks_of(h, w))
    return jnp.asarray(blk), jnp.asarray(intra)


def test_batch_detect_matches_single(mesh8, make_image):
    h = w = 64
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = _indices(key, h, w)
    cover = make_image(h, w)
    wm = make_image(h, w, blur=False)[..., 0]
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm),
                             blk, intra, jnp.float32(0.12))
    stego = np.asarray(res.stego_bgr)
    stegos = jnp.asarray(np.stack([stego] * 16))

    scores = np.asarray(pbatch.batch_detect_blocked(
        stegos, res.sc, res.sw, 0.12, mesh=mesh8))
    assert scores.shape == (16,)
    single = float(blocked.detect_gray(jnp.asarray(stego), res.sc, res.sw,
                                       jnp.float32(0.12)))
    np.testing.assert_allclose(scores, single, atol=1e-5)

    # sweep replay rides the sharded path too (code-review r3: the
    # sharded spectrum must replay the meta's embed-time schedule like
    # single-chip detect_paths, not this process's serving default)
    scores_rp = np.asarray(pbatch.batch_detect_blocked(
        stegos, res.sc, res.sw, 0.12, mesh=mesh8, sweeps=2))
    single_rp = float(blocked.detect_gray(jnp.asarray(stego), res.sc,
                                          res.sw, jnp.float32(0.12),
                                          sweeps=2))
    np.testing.assert_allclose(scores_rp, single_rp, atol=1e-5)


def test_batch_embed_sharded(mesh8, make_image):
    h = w = 64
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = _indices(key, h, w)
    frames = jnp.asarray(np.stack([make_image(h, w) for _ in range(8)]))
    wm = jnp.asarray(make_image(h, w, blur=False)[..., 0])

    out = pbatch.batch_embed_blocked(frames, wm, blk, intra, 0.12,
                                     mesh=mesh8)
    assert out["stego"].shape == (8, h, w, 3)
    assert out["sc"].shape == (8, (h // 8) * (w // 8), 8)

    # matches the unsharded graph (different broadcast/fusion paths may
    # differ by 1 ulp at u8 clip boundaries)
    ref = blocked.embed_gray(frames, jnp.broadcast_to(wm, (8, h, w)),
                             blk, intra, jnp.float32(0.12))
    diff = np.abs(np.asarray(out["stego"], np.int32)
                  - np.asarray(ref.stego_bgr, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_plane_sharded_embed_detect(mesh8, make_image):
    """One large frame sharded into horizontal bands (parallel/plane.py):
    sharded embed must equal the single-device blocked embed exactly, and
    the gathered band-median detect must fire."""
    from dctsvd_tpu.parallel import plane as pplane

    h, w = 8 * 8 * 8, 128            # H divisible by 8*n_devices
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = _indices(key, h, w)
    cover = jnp.asarray(make_image(h, w))
    wm = jnp.asarray(make_image(h, w, blur=False)[..., 0])

    pw = blocked.prepare_wm_gray(wm, blk, intra)
    stego_s, sc_s = pplane.plane_embed_gray(cover, pw.sw, 0.12, mesh=mesh8)

    ref_stego, ref_sc, _, _ = blocked.embed_gray_prepared(
        cover, pw.sw, jnp.float32(0.12), with_metrics=False)
    np.testing.assert_array_equal(np.asarray(stego_s), np.asarray(ref_stego))
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(ref_sc),
                               rtol=2e-5, atol=1e-2)

    score = float(pplane.plane_detect_gray(stego_s, sc_s, pw.sw, 0.12,
                                           mesh=mesh8))
    assert score > 0.8, score

    clean = float(pplane.plane_detect_gray(cover, sc_s, pw.sw, 0.12,
                                           mesh=mesh8))
    assert abs(clean) < 0.3, clean


def test_init_distributed_passthrough(monkeypatch):
    """Multi-host init (SURVEY §2.7): verify the passthrough forwards the
    coordinator triple to jax.distributed.initialize and the no-arg form
    defers to environment auto-detection. A real multi-process pod cannot
    run in CI — this pins the contract the pod entrypoint relies on."""
    import jax
    from dctsvd_tpu.parallel import mesh as mesh_lib

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    mesh_lib.init_distributed()
    assert calls[-1] == {}
    mesh_lib.init_distributed("10.0.0.1:1234", num_processes=4,
                              process_id=2)
    assert calls[-1] == dict(coordinator_address="10.0.0.1:1234",
                             num_processes=4, process_id=2)


def test_batch_serve_verify_detect(mesh8, make_image):
    """The sharded single-dispatch serve step (embed+verify+score per
    shard) matches the single-device combined entry point."""
    h = w = 64
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = _indices(key, h, w)
    frames = jnp.asarray(np.stack([make_image(h, w) for _ in range(8)]))
    wm = jnp.asarray(make_image(h, w, blur=False))
    pwc = blocked.prepare_wm_color(wm, blk, intra)
    iblk = pwc.inv_blk

    stego, sc, rec, scores = pbatch.batch_serve_verify_detect(
        frames, pwc.sw, 0.12, pwc.ebasis, iblk, mesh=mesh8)
    ref = blocked.serve_verify_detect_color_prepared(
        frames, pwc.sw, jnp.float32(0.12), pwc.ebasis, iblk)
    np.testing.assert_array_equal(np.asarray(stego), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(ref[2]))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref[3]),
                               atol=1e-5)
    assert float(jnp.min(scores)) > 0.8
    assert len(stego.sharding.device_set) == 8
