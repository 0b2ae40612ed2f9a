"""Property/robustness tests (SURVEY.md §4.3): round-trip NC across the
alpha grid, detection under JPEG/noise attacks, clean-host rejection."""

import cv2
import numpy as np
import pytest

import oracle
from dctsvd_tpu import api


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("rob")
    rng = np.random.default_rng(99)
    cover = cv2.GaussianBlur(
        rng.integers(0, 256, (256, 256, 3), np.uint8), (0, 0), 3.0)
    wm = np.zeros((64, 64, 3), np.uint8)
    cv2.putText(wm, "W", (10, 52), cv2.FONT_HERSHEY_SIMPLEX, 2.0,
                (255, 255, 255), 5)
    cp, wp = str(d / "c.png"), str(d / "w.png")
    cv2.imwrite(cp, cover)
    cv2.imwrite(wp, wm)
    return d, cp, wp


@pytest.mark.parametrize("alpha", [0.10, 0.14, 0.18, 0.22])
def test_alpha_grid_roundtrip(assets, alpha):
    d, cp, wp = assets
    out, mp, ps, ss = api.embed(cp, wp, str(d / f"s{alpha}.png"),
                                str(d / f"m{alpha}.npz"), alpha=alpha,
                                password="pw")
    found, score = api.detect(out, mp)
    assert found and score > 0.85
    # stronger alpha -> stego further from cover but detection intact
    assert ps > 18


def _attack_jpeg(img, q=50):
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR)


def _attack_noise(img, sigma=5.0, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(img.astype(float) + rng.normal(0, sigma, img.shape),
                   0, 255).astype(np.uint8)


@pytest.mark.parametrize("method", ["full", "blocked"])
def test_detect_survives_attacks(assets, method):
    d, cp, wp = assets
    out, mp, *_ = api.embed(cp, wp, str(d / f"s_{method}.png"),
                            str(d / f"m_{method}.npz"), alpha=0.12,
                            password="pw", method=method)
    stego = cv2.imread(out)

    for name, attacked in [("jpeg50", _attack_jpeg(stego)),
                           ("noise5", _attack_noise(stego))]:
        ap = str(d / f"att_{method}_{name}.png")
        cv2.imwrite(ap, attacked)
        found, score = api.detect(ap, mp)
        # reference measured 0.979/0.982 on the same attacks (BASELINE.md)
        assert found and score > 0.7, (method, name, score)

    # clean host must NOT trigger
    found, score = api.detect(cp, mp)
    assert not found


def test_blocked_detect_survives_crop(assets):
    """Localized damage: blanking 25% of rows must not kill detection
    (median-of-band NC — a global NC measured -0.26 on this attack)."""
    d, cp, wp = assets
    out, mp, *_ = api.embed(cp, wp, str(d / "s_crop.png"),
                            str(d / "m_crop.npz"), alpha=0.12,
                            password="pw", method="blocked")
    stego = cv2.imread(out)
    stego[: stego.shape[0] // 4] = 0
    ap = str(d / "att_crop.png")
    cv2.imwrite(ap, stego)
    found, score = api.detect(ap, mp)
    assert found and score > 0.8, score


def test_full_path_matches_oracle_under_attack(assets):
    """Cross-impl: oracle embeds, we detect on the attacked stego, scores
    must agree within 1e-3 (both recompute the same math)."""
    d, cp, wp = assets
    cover = cv2.imread(cp)
    wm = cv2.imread(wp)
    stego, meta, _ = oracle.embed_gray(cover, wm, 0.12, "pw", bytes(8))
    attacked = _attack_jpeg(stego)
    ap = str(d / "oracle_att.png")
    mp = str(d / "oracle_m.npz")
    cv2.imwrite(ap, attacked)
    np.savez_compressed(mp, **meta)
    _, ours = api.detect(ap, mp)
    theirs = oracle.detect(attacked, meta)
    assert abs(ours - theirs) < 1e-3


def test_blocked_detect_survives_resize_restore(assets):
    """Scaling attack: downscale the stego to 50% and restore. The top
    half of the spectrum dies, but the per-block top components are
    DC-dominated and survive attenuated — and the detector's gates are
    deliberately one-sided, so an attenuated genuine mark keeps its
    score (CPU probe at 512²: detect ~1.0 across the alpha grid)."""
    d, cp, wp = assets
    out, mp, *_ = api.embed(cp, wp, str(d / "s_rz.png"),
                            str(d / "m_rz.npz"), alpha=0.12,
                            password="pw", method="blocked")
    stego = cv2.imread(out)
    h, w = stego.shape[:2]
    small = cv2.resize(stego, (w // 2, h // 2),
                       interpolation=cv2.INTER_AREA)
    back = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    ap = str(d / "att_rz.png")
    cv2.imwrite(ap, back)
    found, score = api.detect(ap, mp)
    assert found and score > 0.7, score
    # the resize-restored ORIGINAL (mark-free low-pass delta) must not
    # trigger
    orig = cv2.imread(cp)
    small_o = cv2.resize(orig, (w // 2, h // 2),
                         interpolation=cv2.INTER_AREA)
    back_o = cv2.resize(small_o, (w, h), interpolation=cv2.INTER_LINEAR)
    op = str(d / "att_rz_orig.png")
    cv2.imwrite(op, back_o)
    found_o, score_o = api.detect(op, mp)
    assert not found_o and abs(score_o) < 0.3, score_o


def test_blocked_extract_majority_crop(assets):
    """62.5 %-row-blank extraction: the quarter-order-statistic presence
    gate keeps the MAP blend engaged when a quarter of the image still
    demonstrably carries the mark, so destroyed blocks repaint as the
    prior (NC ≈ 0.92 measured at 128²–512²; the median gate disengaged
    at >50 % damage and fell to the clamp path's ≈ 0.55)."""
    d, cp, wp = assets
    out, mp, *_ = api.embed(cp, wp, str(d / "s_c62.png"),
                            str(d / "m_c62.npz"), alpha=0.13,
                            password="pw", method="blocked")
    stego = cv2.imread(out)
    h, w = stego.shape[:2]
    attacked = stego.copy()
    attacked[: int(h * 0.625)] = 0
    ap = str(d / "att_c62.png")
    cv2.imwrite(ap, attacked)
    rec_path = api.extract(ap, mp, str(d / "rec_c62.png"), password="pw")
    rec = cv2.cvtColor(cv2.imread(rec_path), cv2.COLOR_BGR2GRAY)
    wm_ref = cv2.cvtColor(
        cv2.resize(cv2.imread(wp), (w, h),
                   interpolation=cv2.INTER_AREA), cv2.COLOR_BGR2GRAY)
    a = rec.astype(np.float64).ravel() - rec.mean()
    b = wm_ref.astype(np.float64).ravel() - wm_ref.mean()
    nc = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))
    assert nc > 0.7, nc


def test_blocked_extract_resize_restore_polarity(assets):
    """Extraction after resize50-restore must come back POSITIVELY
    correlated with the watermark. The attack collapses the sub-dominant
    per-block singular components into large NEGATIVE raw estimates
    (cover-energy loss, amplified by 1/alpha); a shared per-block
    confidence weight let that bias through on every component and the
    extracted image came out polarity-inverted (NC −0.52 on the round-4
    hardware robustness table). Per-component weights + the
    negative→prior rule in _shrink_sw_hat fix it (NC ≈ 0.9)."""
    d, cp, wp = assets
    out, mp, *_ = api.embed(cp, wp, str(d / "s_rzx.png"),
                            str(d / "m_rzx.npz"), alpha=0.13,
                            password="pw", method="blocked")
    stego = cv2.imread(out)
    h, w = stego.shape[:2]
    small = cv2.resize(stego, (w // 2, h // 2),
                       interpolation=cv2.INTER_AREA)
    back = cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)
    ap = str(d / "att_rzx.png")
    cv2.imwrite(ap, back)
    rec_path = api.extract(ap, mp, str(d / "rec_rzx.png"), password="pw")
    rec = cv2.cvtColor(cv2.imread(rec_path), cv2.COLOR_BGR2GRAY)
    wm_ref = cv2.cvtColor(
        cv2.resize(cv2.imread(wp), (w, h),
                   interpolation=cv2.INTER_AREA), cv2.COLOR_BGR2GRAY)
    a = rec.astype(np.float64).ravel() - rec.mean()
    b = wm_ref.astype(np.float64).ravel() - wm_ref.mean()
    nc = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))
    assert nc > 0.6, nc


def test_blocked_detect_translation_resync(assets):
    """Geometric misalignment (VERDICT r4 #2): a sub-block translation
    (border-replicate warp, not a wrapping roll) collapses the unaided
    blocked detect to ~0 — the 8×8 grid's structural weakness — and the
    translation-resync search recovers the aligned score AND the exact
    shift. The aligned stego must keep its plain score through the
    resync path (the (0,0) candidate is scored exactly)."""
    import jax.numpy as jnp
    from dctsvd_tpu.io import meta as metaio
    from dctsvd_tpu.models import blocked
    d, cp, wp = assets
    out, mp, _, _ = api.embed(cp, wp, str(d / "geo.png"),
                              str(d / "geo_m.npz"), alpha=0.13,
                              password="pw", method="blocked")
    ok, aligned = api.detect(out, mp)
    assert ok and aligned > 0.8

    stego = cv2.imread(out, cv2.IMREAD_COLOR)
    meta = metaio.load_meta(mp)
    sc = jnp.asarray(meta.arrays["Sc"])
    sw = jnp.asarray(meta.arrays["Sw"])
    # plain-detect degradation is content-dependent (this σ3-blurred host
    # degrades gracefully: 0.87 at 3 px) but ALWAYS collapses by (7,7);
    # resync must recover ~1.0 and the exact shift everywhere
    for (sy, sx), plain_max in (((2, 3), 0.9), ((4, 4), 0.5),
                                ((7, 7), 0.1)):
        m = np.float32([[1, 0, sx], [0, 1, sy]])
        shifted = cv2.warpAffine(stego, m,
                                 (stego.shape[1], stego.shape[0]),
                                 borderMode=cv2.BORDER_REPLICATE)
        plain = float(blocked.detect_gray(jnp.asarray(shifted[None]),
                                          sc, sw,
                                          jnp.float32(meta.alpha))[0])
        assert plain < plain_max, (sy, sx, plain)
        score, t, ang = blocked.detect_gray_resync(jnp.asarray(shifted),
                                                   sc, sw, meta.alpha)
        assert score > 0.95, (sy, sx, score)
        assert t == (sy, sx), (t, (sy, sx))
        assert ang == 0.0
    # api surface: resync rescues the file-level detect at the collapse
    sp = str(d / "geo_shift77.png")
    cv2.imwrite(sp, shifted)
    ok_plain, s_plain = api.detect(sp, mp)
    ok_rs, s_rs = api.detect(sp, mp, resync=True)
    assert not ok_plain and s_plain < 0.1
    assert ok_rs and s_rs > 0.95

    # aligned stego through the resync entry point: same score, (0, 0)
    score0, t0, ang0 = blocked.detect_gray_resync(jnp.asarray(stego), sc,
                                                  sw, meta.alpha)
    assert t0 == (0, 0) and ang0 == 0.0
    assert abs(score0 - aligned) < 1e-3

    # explicit resync=True must search even when the degraded plain score
    # still clears the threshold (a 2-3 px shift on this host degrades
    # without missing): the caller asked for the aligned score, and the
    # (0,0) candidate guarantees the result is never worse than plain.
    m = np.float32([[1, 0, 3], [0, 1, 2]])
    sp23 = str(d / "geo_shift23.png")
    cv2.imwrite(sp23, cv2.warpAffine(stego, m,
                                     (stego.shape[1], stego.shape[0]),
                                     borderMode=cv2.BORDER_REPLICATE))
    ok_p23, s_p23 = api.detect(sp23, mp)
    ok_r23, s_r23 = api.detect(sp23, mp, resync=True)
    assert ok_p23 and ok_r23
    assert s_r23 > 0.95 and s_r23 >= s_p23, (s_p23, s_r23)


def test_scale_restore_on_shape_mismatch(assets):
    """A stego rescaled after embedding (thumbnail/re-post) must not
    hard-crash with a device-graph shape mismatch (the reference does,
    ref app_dct_svd_single.py:204-210): the api restores the meta's
    embed-time shape host-side and proceeds, warning, with scores in the
    measured resize-restore regime. An UPSCALED copy restores nearly
    losslessly."""
    import pytest as _pytest
    d, cp, wp = assets
    out, mp, _, _ = api.embed(cp, wp, str(d / "sc.png"),
                              str(d / "sc_m.npz"), alpha=0.14,
                              password="pw", method="blocked")
    stego = cv2.imread(out)
    h, w = stego.shape[:2]
    up = str(d / "sc_up.png")
    cv2.imwrite(up, cv2.resize(stego, (w * 2, h * 2),
                               interpolation=cv2.INTER_LINEAR))
    with _pytest.warns(UserWarning, match="rescaling"):
        ok_up, s_up = api.detect(up, mp)
    assert ok_up and s_up > 0.8, s_up

    down = str(d / "sc_down.png")
    cv2.imwrite(down, cv2.resize(stego, (w // 2, h // 2),
                                 interpolation=cv2.INTER_AREA))
    with _pytest.warns(UserWarning, match="rescaling"):
        ok_dn, s_dn = api.detect(down, mp)
    assert s_dn > 0.3, s_dn        # the resize50-restore regime
    with _pytest.warns(UserWarning, match="rescaling"):
        rec = api.extract(down, mp, str(d / "sc_rec.png"), password="pw")
    assert cv2.imread(rec) is not None


def test_blocked_detect_rotation_resync(assets):
    """Rotation resync (round 5; closes the r4 'translation-only'
    limitation): counter-rotating the stego about its center restores
    the 8×8 grid globally, so rotation is a search axis like translation.
    A 1° cv2 rotation degrades the unaided detect; the rot_range search
    must recover a strong score and the attacker's angle — and a combined
    rotation+translation attack must yield both estimates."""
    import jax.numpy as jnp
    from dctsvd_tpu.io import meta as metaio
    from dctsvd_tpu.models import blocked
    d, cp, wp = assets
    out, mp, _, _ = api.embed(cp, wp, str(d / "rot.png"),
                              str(d / "rot_m.npz"), alpha=0.14,
                              password="pw", method="blocked")
    stego = cv2.imread(out, cv2.IMREAD_COLOR)
    h, w = stego.shape[:2]
    meta = metaio.load_meta(mp)
    sc = jnp.asarray(meta.arrays["Sc"])
    sw = jnp.asarray(meta.arrays["Sw"])

    deg = 1.0
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    rot = cv2.warpAffine(stego, m, (w, h),
                         borderMode=cv2.BORDER_REPLICATE)
    plain = float(blocked.detect_gray(jnp.asarray(rot[None]), sc, sw,
                                      jnp.float32(meta.alpha))[0])
    # pure rotation about center: no translation residue, so window=1
    # (single (0,0) shift) isolates the angle axis
    score, t, ang = blocked.detect_gray_resync(
        jnp.asarray(rot), sc, sw, meta.alpha, window=1, chunk=1,
        rot_range=1.2, rot_step=0.1)
    # degradation at 1° is content/size-dependent (a 256² smooth host
    # degrades gracefully; 4K collapses — bench --config geometric), so
    # assert recovery quality, not a collapse margin
    assert score > 0.9 and score >= plain, (plain, score)
    assert abs(ang - deg) <= 0.1 + 1e-6, ang
    assert t == (0, 0), t

    # combined rotation + translation: both axes must resolve
    m2 = np.float32([[1, 0, 2], [0, 1, 1]])
    rot_sh = cv2.warpAffine(rot, m2, (w, h),
                            borderMode=cv2.BORDER_REPLICATE)
    score2, t2, ang2 = blocked.detect_gray_resync(
        jnp.asarray(rot_sh), sc, sw, meta.alpha, window=4,
        rot_range=1.0, rot_step=0.5)
    assert score2 > 0.6, score2
    assert abs(ang2 - deg) < 1e-6, ang2
    assert t2 == (1, 2), t2

    # unrotated stego through the rotation search: exact aligned result
    # (the 0.0 candidate is lossless)
    s0, t0, a0 = blocked.detect_gray_resync(
        jnp.asarray(stego), sc, sw, meta.alpha, window=1, chunk=1,
        rot_range=0.2, rot_step=0.1)
    s_aligned = float(blocked.detect_gray(jnp.asarray(stego[None]), sc,
                                          sw, jnp.float32(meta.alpha))[0])
    assert a0 == 0.0 and t0 == (0, 0)
    assert abs(s0 - s_aligned) < 1e-5

    # api/CLI surface
    rp = str(d / "rot_attack.png")
    cv2.imwrite(rp, rot)
    ok_r, s_r = api.detect(rp, mp, resync=True, rot_range=1.2,
                           rot_step=0.1)
    assert ok_r and s_r > 0.6
