"""Blocked (throughput-path) scheme tests: self-consistent round trips,
batch behavior, and the path-based API with method='blocked'."""

import numpy as np
import pytest

import oracle
from dctsvd_tpu import api
from dctsvd_tpu.models import blocked
from dctsvd_tpu.utils import crypto

import jax.numpy as jnp

PW = "blockpw"


def _setup(make_image, h=96, w=112):
    cover = make_image(h, w)
    wm = make_image(h, w, blur=False)
    import cv2
    wm_gray = cv2.cvtColor(wm, cv2.COLOR_BGR2GRAY)
    key = crypto.derive_key(PW, bytes(range(8)))
    blk, intra = crypto.block_permutation_indices(key,
                                                  blocked.n_blocks_of(h, w))
    inv_blk = crypto.inverse_permutation(blk)
    inv_intra = crypto.inverse_permutation(intra)
    idxs = (jnp.asarray(blk), jnp.asarray(intra))
    invs = (jnp.asarray(inv_blk), jnp.asarray(inv_intra))
    return cover, wm, wm_gray, key, idxs, invs


def test_gray_embed_extract_detect(make_image):
    cover, wm, wm_gray, key, (blk, intra), (iblk, iintra) = _setup(make_image)
    alpha = jnp.float32(0.12)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm_gray),
                             blk, intra, alpha)
    stego = np.asarray(res.stego_bgr)
    assert float(res.psnr) > 20

    score = float(blocked.detect_gray(jnp.asarray(stego), res.sc, res.sw,
                                      alpha))
    assert score > 0.8

    # clean host scores low
    clean = float(blocked.detect_gray(jnp.asarray(cover), res.sc, res.sw,
                                      alpha))
    assert abs(clean) < 0.3

    wm_out = np.asarray(blocked.extract_gray(
        jnp.asarray(stego), res.sc, res.uw, res.vwt, iblk, iintra, alpha))
    assert oracle.nc(wm_out, wm_gray) > 0.5


def test_color_embed_detect(make_image):
    cover, wm, _, key, (blk, intra), (iblk, iintra) = _setup(make_image)
    alpha = jnp.float32(0.12)
    res = blocked.embed_color(jnp.asarray(cover), jnp.asarray(wm),
                              blk, intra, alpha)
    assert float(res.psnr) > 20
    score = float(blocked.detect_color(np.asarray(res.stego_bgr), res.sc,
                                       res.sw, alpha))
    assert score > 0.8
    wm_out = np.asarray(blocked.extract_color(
        np.asarray(res.stego_bgr), res.sc, res.uw, res.vwt,
        iblk, iintra, alpha))
    assert oracle.nc(wm_out, wm) > 0.4


def test_prepared_matches_convenience(make_image):
    """prepare + embed_prepared must equal the one-shot embed."""
    cover, wm, wm_gray, key, (blk, intra), _ = _setup(make_image, 64, 64)
    alpha = jnp.float32(0.12)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm_gray),
                             blk, intra, alpha)
    pw = blocked.prepare_wm_gray(jnp.asarray(wm_gray), blk, intra)
    stego2, sc2, _, _ = blocked.embed_gray_prepared(jnp.asarray(cover),
                                                    pw.sw, alpha)
    np.testing.assert_array_equal(np.asarray(res.stego_bgr),
                                  np.asarray(stego2))
    np.testing.assert_allclose(np.asarray(res.sc), np.asarray(sc2))
    np.testing.assert_allclose(np.asarray(res.uw), np.asarray(pw.uw))


def test_prepared_extract_matches_plain(make_image):
    """The pixel-basis serving extract must reproduce the einsum extract
    exactly (same math, reassociated): gray and color."""
    cover, wm, wm_gray, key, (blk, intra), (iblk, iintra) = _setup(
        make_image, 64, 80)
    alpha = jnp.float32(0.12)

    pw = blocked.prepare_wm_gray(jnp.asarray(wm_gray), blk, intra)
    stego, sc, _, _ = blocked.embed_gray_prepared(jnp.asarray(cover),
                                                  pw.sw, alpha)
    plain = np.asarray(blocked.extract_gray(stego, sc, pw.uw, pw.vwt,
                                            iblk, iintra, alpha))
    fast = np.asarray(blocked.extract_gray_prepared(stego, sc, pw.ebasis,
                                                    iblk, alpha))
    assert np.mean(np.abs(plain.astype(np.float32)
                          - fast.astype(np.float32))) < 0.02
    assert np.max(np.abs(plain.astype(np.float32)
                         - fast.astype(np.float32))) <= 1.0

    pwc = blocked.prepare_wm_color(jnp.asarray(wm), blk, intra)
    stego_c, sc_c, _, _ = blocked.embed_color_prepared(jnp.asarray(cover),
                                                       pwc.sw, alpha)
    plain_c = np.asarray(blocked.extract_color(stego_c, sc_c, pwc.uw,
                                               pwc.vwt, iblk, iintra, alpha))
    fast_c = np.asarray(blocked.extract_color_prepared(stego_c, sc_c,
                                                       pwc.ebasis, iblk,
                                                       alpha))
    assert np.mean(np.abs(plain_c.astype(np.float32)
                          - fast_c.astype(np.float32))) < 0.02


def test_batched_frames(make_image):
    """Leading batch dim — the video/throughput shape."""
    cover, wm, wm_gray, key, (blk, intra), invs = _setup(make_image, 64, 64)
    frames = np.stack([cover] * 3)
    wms = np.stack([wm_gray] * 3)
    alpha = jnp.float32(0.1)
    res = blocked.embed_gray(jnp.asarray(frames), jnp.asarray(wms),
                             blk, intra, alpha)
    assert res.stego_bgr.shape == (3, 64, 64, 3)
    assert res.sc.shape == (3, 64, 8)
    scores = np.asarray(blocked.detect_gray(res.stego_bgr, res.sc, res.sw,
                                            alpha))
    assert scores.shape == (3,)
    assert (scores > 0.8).all()


def test_odd_sizes_pad(make_image):
    cover, wm, wm_gray, key, (blk, intra), invs = _setup(make_image, 67, 93)
    alpha = jnp.float32(0.12)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm_gray),
                             blk, intra, alpha)
    assert res.stego_bgr.shape == (67, 93, 3)
    score = float(blocked.detect_gray(res.stego_bgr, res.sc, res.sw, alpha))
    assert score > 0.7


def test_api_blocked_roundtrip(tmp_path, make_image):
    import cv2
    cover = make_image(96, 96)
    wm = make_image(40, 40, blur=False)
    cp, wp = str(tmp_path / "c.png"), str(tmp_path / "w.png")
    cv2.imwrite(cp, cover)
    cv2.imwrite(wp, wm)
    out, meta_p, ps, ss = api.embed(cp, wp, str(tmp_path / "s.png"),
                                    str(tmp_path / "m.npz"), alpha=0.12,
                                    password=PW, method="blocked")
    assert ps > 20
    found, score = api.detect(out, meta_p)
    assert found and score > 0.8
    wm_out = api.extract(out, meta_p, str(tmp_path / "x.png"), password=PW,
                         enhance=False)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    ref = cv2.cvtColor(cv2.resize(wm, (96, 96),
                                  interpolation=cv2.INTER_AREA),
                       cv2.COLOR_BGR2GRAY)
    assert oracle.nc(got, ref) > 0.5
    with pytest.raises(ValueError):
        api.extract(out, meta_p, str(tmp_path / "y.png"), password="nope")


def test_crop_damage_extraction_clamped(make_image, rng):
    """Locally-destroyed blocks (25% of rows blanked) must not wreck
    extraction: the keyed block permutation scatters the damage and the
    Wiener-style shrinkage (_shrink_sw_hat, VERDICT r3 #6) blends each
    block's estimate toward the stored Sw with a deviation-based
    confidence — destroyed blocks (deviation 10-1000x the watermark
    scale) collapse to the prior instead of wrecking the min-max window.
    History: raw estimate NC ~ -0.15; hard clamp ~ +0.5; clamp+erasure
    repaint ~ 0.8 (rounds 2-3); shrinkage ~ 0.95+."""
    import cv2
    from dctsvd_tpu.utils import crypto

    h, w = 96, 128
    cover = make_image(h, w)
    wm = np.zeros((h, w), np.uint8)
    cv2.circle(wm, (w // 2, h // 2), 30, 255, -1)
    key = crypto.derive_key("pw", bytes(8))
    blk, intra = crypto.block_permutation_indices(
        key, blocked.n_blocks_of(h, w))
    blk, intra = jnp.asarray(blk), jnp.asarray(intra)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm), blk,
                             intra, jnp.float32(0.12))
    stego = np.asarray(res.stego_bgr).copy()
    stego[: h // 4] = 0                      # destroy 25% of rows

    inv_blk = jnp.argsort(blk)
    inv_intra = jnp.argsort(intra)
    rec = np.asarray(blocked.extract_gray(
        jnp.asarray(stego), res.sc, res.uw, res.vwt, inv_blk, inv_intra,
        jnp.float32(0.12), sw=res.sw))
    a = rec.astype(np.float32) - rec.mean()
    b = wm.astype(np.float32) - wm.mean()
    nc = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    assert nc > 0.9, nc

    # the erasure path must not disturb a clean extraction
    rec_clean = np.asarray(blocked.extract_gray(
        res.stego_bgr, res.sc, res.uw, res.vwt, inv_blk, inv_intra,
        jnp.float32(0.12), sw=res.sw))
    a = rec_clean.astype(np.float32) - rec_clean.mean()
    nc_clean = float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))
    assert nc_clean > 0.9, nc_clean


def test_image_meta_records_sweeps(tmp_path, make_image):
    """The blocked image meta records the embed-time sweep schedule
    (0 on the XLA fallback path tests run on) and extraction replays it."""
    import cv2
    from dctsvd_tpu.io import meta as metaio
    from dctsvd_tpu.models import blocked as m_blocked
    cover, wm = make_image(64, 64), make_image(32, 32, blur=False)
    cp, wp = str(tmp_path / "c.png"), str(tmp_path / "w.png")
    cv2.imwrite(cp, cover)
    cv2.imwrite(wp, wm)
    out, mp, *_ = api.embed(cp, wp, str(tmp_path / "s.png"),
                            str(tmp_path / "m.npz"), password="pw",
                            method="blocked")
    meta = metaio.load_meta(mp)
    assert ((meta.sweeps, meta.sweeps_xpairs)
            == m_blocked.embed_schedule_used())
    assert meta.sched() == m_blocked.embed_sweeps_used()


def test_serve_verify_matches_split(make_image):
    """serve_verify_color_prepared == embed_color_prepared followed by
    extract_color_prepared (on CPU it composes them; on TPU the fused
    roundtrip is pinned bit-identical by test_roundtrip_matches_split)."""
    cover, wm, wm_gray, key, (blk, intra), (iblk, iintra) = _setup(
        make_image, 64, 80)
    alpha = jnp.float32(0.12)
    pwc = blocked.prepare_wm_color(jnp.asarray(wm), blk, intra)
    stego, sc, rec = blocked.serve_verify_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha, pwc.ebasis, iblk)
    stego2, sc2, _, _ = blocked.embed_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha, with_metrics=False)
    rec2 = blocked.extract_color_prepared(stego2, sc2, pwc.ebasis, iblk,
                                          alpha, sw=pwc.sw)
    np.testing.assert_array_equal(np.asarray(stego), np.asarray(stego2))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))
    assert rec.dtype == jnp.uint8 and stego.dtype == jnp.uint8


def test_detect_mark_free_negatives_gated(make_image, rng):
    """Mark-free images must score near 0 even when their delta spectrum
    mimics the watermark's magnitude structure (round-4 ROC
    characterization): UNRELATED content scored up to ±0.79 through the
    scale-invariant NC's profile sensitivity (closed by
    band_scale_damp), and PERTURBED ORIGINALS — the clean host
    brightened, re-JPEG'd, or noised, scored against its own meta — up
    to 0.998 (profile-shaped energy deltas; closed by
    band_presence_damp's keyed block-to-block ρ0 gate). Genuine stegos
    (incl. JPEG-q50'd) must stay above the 0.6 threshold."""
    import cv2
    h = w = 128
    cover, wm, wm_gray, key, (blk, intra), _ = _setup(make_image, h, w)
    alpha = jnp.float32(0.10)
    res = blocked.embed_gray(jnp.asarray(cover), jnp.asarray(wm_gray),
                             blk, intra, alpha)

    # unrelated content: different families, both directions
    negatives = [
        rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8),
        cv2.GaussianBlur(rng.integers(0, 256, (h, w, 3), np.uint8)
                         .astype(np.uint8), (0, 0), 4),
        np.clip(np.linspace(0, 255, h)[:, None, None]
                + np.zeros((h, w, 3)), 0, 255).astype(np.uint8),
        # perturbed originals (mark never embedded) — including the
        # magnitude-matched brightness window that defeats the scale
        # gate alone
        np.clip(cover.astype(np.int16) + 3, 0, 255).astype(np.uint8),
        np.clip(cover.astype(np.int16) + 12, 0, 255).astype(np.uint8),
        cv2.imdecode(cv2.imencode(
            ".jpg", cover, [cv2.IMWRITE_JPEG_QUALITY, 70])[1],
            cv2.IMREAD_COLOR),
        np.clip(cover.astype(np.float32)
                + rng.normal(0, 3, cover.shape), 0, 255).astype(np.uint8),
    ]
    for other in negatives:
        s = float(blocked.detect_gray(jnp.asarray(other), res.sc, res.sw,
                                      alpha))
        assert abs(s) < 0.5, s

    # the gates must not damp genuine positives
    stego = np.asarray(res.stego_bgr)
    assert float(blocked.detect_gray(jnp.asarray(stego), res.sc, res.sw,
                                     alpha)) > 0.8
    jpg = cv2.imdecode(cv2.imencode(
        ".jpg", stego, [cv2.IMWRITE_JPEG_QUALITY, 50])[1], cv2.IMREAD_COLOR)
    assert float(blocked.detect_gray(jnp.asarray(jpg), res.sc, res.sw,
                                     alpha)) > 0.7

    # color mode: same gates per channel (scores averaged)
    resc = blocked.embed_color(jnp.asarray(cover), jnp.asarray(wm),
                               blk, intra, alpha)
    assert float(blocked.detect_color(resc.stego_bgr, resc.sc, resc.sw,
                                      alpha)) > 0.8
    bright = np.clip(cover.astype(np.int16) + 6, 0, 255).astype(np.uint8)
    s = float(blocked.detect_color(jnp.asarray(bright), resc.sc, resc.sw,
                                   alpha))
    assert abs(s) < 0.5, s


def test_serve_verify_detect_matches_split(make_image):
    """serve_verify_detect_color_prepared (the single-dispatch
    embed+verify+score production step) must equal the split
    embed -> extract -> detect calls on its produced stego."""
    cover, wm, _, key, (blk, intra), (iblk, _) = _setup(make_image, 64, 80)
    alpha = jnp.float32(0.12)
    pwc = blocked.prepare_wm_color(jnp.asarray(wm), blk, intra)
    stego, sc, rec, scores = blocked.serve_verify_detect_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha, pwc.ebasis, iblk)
    stego2, sc2, _, _ = blocked.embed_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha, with_metrics=False)
    rec2 = blocked.extract_color_prepared(stego2, sc2, pwc.ebasis, iblk,
                                          alpha, sw=pwc.sw)
    score2 = blocked.detect_color(stego2, sc2, pwc.sw, alpha)
    np.testing.assert_array_equal(np.asarray(stego), np.asarray(stego2))
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(rec2))
    np.testing.assert_allclose(float(scores), float(score2), atol=1e-5)
    assert float(scores) > 0.8


def test_serve_detect_matches_split(make_image):
    """serve_detect_color_prepared (embed + score WITHOUT the extract
    image — the cheapest complete serving step) must equal the split
    embed -> detect calls on its produced stego."""
    cover, wm, _, key, (blk, intra), (iblk, _) = _setup(make_image, 64, 80)
    alpha = jnp.float32(0.12)
    pwc = blocked.prepare_wm_color(jnp.asarray(wm), blk, intra)
    stego, sc, scores = blocked.serve_detect_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha)
    stego2, sc2, _, _ = blocked.embed_color_prepared(
        jnp.asarray(cover), pwc.sw, alpha, with_metrics=False)
    score2 = blocked.detect_color(stego2, sc2, pwc.sw, alpha)
    np.testing.assert_array_equal(np.asarray(stego), np.asarray(stego2))
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(sc2))
    np.testing.assert_allclose(float(scores), float(score2), atol=1e-5)
    assert float(scores) > 0.8


def test_extraction_prior_gated_on_presence(make_image, rng):
    """The shrinkage prior must engage ONLY when the mark is present:
    a mark-free input (unrelated image, or the clean original) would
    otherwise deviate hugely in every block, shrink wholesale to the
    stored Sw, and extraction would 'recover' a near-perfect watermark
    from an image that never carried it (measured NC 0.997 before the
    presence ramp). Genuine stegos — including 25%-cropped, whose
    destroyed blocks must not crush the presence statistic — keep the
    full MAP blend."""
    import cv2
    h = w = 128
    cover, _, _, key, (blk, intra), _ = _setup(make_image, h, w)
    wm = np.zeros((h, w), np.uint8)
    cv2.circle(wm, (w // 2, h // 2), 30, 255, -1)
    alpha = jnp.float32(0.12)
    pw = blocked.prepare_wm_gray(jnp.asarray(wm), blk, intra)
    stego, sc, _, _ = blocked.embed_gray_prepared(
        jnp.asarray(cover)[None], pw.sw, alpha, with_metrics=False)

    def nc(a, b):
        a = a.astype(np.float32).ravel() - a.mean()
        b = b.astype(np.float32).ravel() - b.mean()
        return float(np.dot(a, b)
                     / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))

    def extract(img):
        return np.asarray(blocked.extract_gray_prepared(
            jnp.asarray(img)[None], sc, pw.ebasis, pw.inv_blk, alpha,
            sw=pw.sw))[0]

    s_np = np.asarray(stego)[0]
    crop = s_np.copy()
    crop[: h // 4] = 0
    assert nc(extract(s_np), wm) > 0.9
    assert nc(extract(crop), wm) > 0.9          # prior active under damage
    # majority damage disengages presence -> the clamp+erasure absent
    # path must still recover the intact minority (round-4 review: the
    # first presence gate fell to NC -0.5 here)
    crop75 = s_np.copy()
    crop75[: h * 3 // 4] = 0
    assert nc(extract(crop75), wm) > 0.3
    unrel = rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8)
    assert nc(extract(unrel), wm) < 0.6          # no near-perfect leak
    assert nc(extract(cover), wm) < 0.5          # clean original -> nothing


def test_fractional_tier_end_to_end(tmp_path, make_image, monkeypatch):
    """Full product path at a fractional tier (DCTSVD_FUSED_SWEEPS=1.5):
    fused embed (interpret kernels standing in for the TPU) -> meta
    records the schedule as the integer pair (1, 14) with a v3 digest ->
    extraction replays it BOTH on the fused path and on the XLA fallback
    (cross-backend replay, verdict r4 #1 / advisor r4: the schedule used
    to die in int() parses and int64 meta slots before reaching either).
    """
    import cv2
    import jax
    from dctsvd_tpu.io import meta as metaio
    from dctsvd_tpu.models import blocked as m_blocked
    from dctsvd_tpu.ops import wm_pallas, metrics

    # force the fused dispatch with interpret-mode kernels on CPU, at the
    # 1.5 tier; unique image size so no earlier trace is replayed
    import functools, types
    for name in ("embed_plane_blocks", "spectrum_plane_blocks"):
        orig = getattr(wm_pallas, name)
        shim = types.SimpleNamespace(__wrapped__=functools.partial(
            orig.__wrapped__, interpret=True))
        monkeypatch.setattr(wm_pallas, name, shim)
    monkeypatch.setattr(m_blocked, "_USE_FUSED_MEMO", [True])
    monkeypatch.setattr(m_blocked, "_FUSED_SWEEPS",
                        m_blocked._parse_sweeps_env("1.5"))
    assert m_blocked._FUSED_SWEEPS == 1.5
    assert m_blocked.embed_schedule_used() == (1, 14)
    jax.clear_caches()   # drop traces that baked in the non-fused branch

    cover, wm = make_image(72, 88), make_image(40, 40, blur=False)
    wm_gray = cv2.cvtColor(wm, cv2.COLOR_BGR2GRAY)
    cp, wp = str(tmp_path / "c.png"), str(tmp_path / "w.png")
    cv2.imwrite(cp, cover)
    cv2.imwrite(wp, wm)
    out, mp, *_ = api.embed(cp, wp, str(tmp_path / "s.png"),
                            str(tmp_path / "m.npz"), alpha=0.12,
                            password=PW, method="blocked")
    meta = metaio.load_meta(mp)
    assert (meta.sweeps, meta.sweeps_xpairs) == (1, 14)
    assert meta.sched() == 1.5
    assert meta.digest_v == m_blocked.DIGEST_V

    def _nc(path):
        rec = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        rec = cv2.resize(rec, (wm_gray.shape[1], wm_gray.shape[0]))
        a = rec.astype(np.float32) - rec.mean()
        b = wm_gray.astype(np.float32) - wm_gray.mean()
        return float((a * b).sum()
                     / np.sqrt((a * a).sum() * (b * b).sum()))

    fused_out = str(tmp_path / "rec_fused.png")
    api.extract(out, mp, fused_out, password=PW, enhance=False)
    nc_fused = _nc(fused_out)
    assert nc_fused > 0.9, nc_fused
    ok, score = api.detect(out, mp)
    assert ok and score > 0.9, score

    # same meta, XLA fallback extraction: svd.jacobi_svd replays the
    # (1, 14) pixel-block schedule exactly, so the recovered mark matches
    # the fused extraction to rounding
    monkeypatch.setattr(m_blocked, "_USE_FUSED_MEMO", [False])
    jax.clear_caches()
    xla_out = str(tmp_path / "rec_xla.png")
    api.extract(out, mp, xla_out, password=PW, enhance=False)
    nc_xla = _nc(xla_out)
    assert nc_xla > 0.9, nc_xla
    f = cv2.imread(fused_out, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    x = cv2.imread(xla_out, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    assert np.abs(f - x).max() <= 2.0, np.abs(f - x).max()
