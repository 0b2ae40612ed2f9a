"""Golden-parity tests: full embed→extract→detect round trips vs the
reference-math oracle (SURVEY.md §4.1 tolerances: PSNR Δ ≤ 0.1 dB,
SSIM Δ ≤ 0.001, detect score Δ ≤ 1e-3)."""

import os

import numpy as np
import pytest

import oracle
from dctsvd_tpu import api

PW = "hunter2"
NONCE = bytes(range(8))


@pytest.fixture()
def cover(make_image):
    return make_image(128, 160)


@pytest.fixture()
def wm(make_image):
    return make_image(48, 48, blur=False)


def _paths(tmp_path, cover, wm):
    import cv2
    cp = str(tmp_path / "cover.png")
    wp = str(tmp_path / "wm.png")
    cv2.imwrite(cp, cover, [cv2.IMWRITE_PNG_COMPRESSION, 0])
    cv2.imwrite(wp, wm, [cv2.IMWRITE_PNG_COMPRESSION, 0])
    return cp, wp


def test_gray_roundtrip_and_parity(tmp_path, cover, wm, monkeypatch):
    # Pin the nonce so our embed and the oracle embed share the exact
    # permutation/key — this makes the BASELINE tolerances (PSNR Δ ≤ 0.1 dB,
    # SSIM Δ ≤ 0.001) directly enforceable instead of the loose
    # different-permutation band.
    from dctsvd_tpu.utils import crypto
    monkeypatch.setattr(crypto, "make_nonce", lambda: NONCE)
    cp, wp = _paths(tmp_path, cover, wm)
    out, meta_p, ps, ss = api.embed(
        cp, wp, str(tmp_path / "stego.png"), str(tmp_path / "meta.npz"),
        alpha=0.12, color=False, password=PW)

    stego_o, meta_o, yw_o = oracle.embed_gray(cover, wm, 0.12, PW, NONCE)
    ps_o = oracle.psnr(cover, stego_o)
    ss_o = oracle.ssim(cover, yw_o)
    assert abs(ps - ps_o) <= 0.1, (ps, ps_o)
    assert abs(ss - ss_o) <= 0.001, (ss, ss_o)
    assert ps > 20

    # our detect on our stego
    found, score = api.detect(out, meta_p)
    assert found and score > 0.9

    # oracle detect on our stego + our meta (cross-impl meta compat)
    import cv2
    stego_img = cv2.imread(out)
    data = dict(np.load(meta_p, allow_pickle=False))
    score_o = oracle.detect(stego_img, data)
    assert abs(score - score_o) < 1e-3

    # extract round trip (disable slow NLM-enhance; deterministic part)
    wm_out = api.extract(out, meta_p, str(tmp_path / "wm_out.png"),
                         password=PW, enhance=False)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_gray_ref = cv2.cvtColor(
        cv2.resize(wm, (160, 128), interpolation=cv2.INTER_AREA),
        cv2.COLOR_BGR2GRAY)
    assert oracle.nc(got, wm_gray_ref) > 0.55


def test_oracle_meta_extracts_with_our_impl(tmp_path, cover, wm):
    """Reference-written meta + reference-made stego must round-trip
    through OUR extract/detect (meta .npz compatibility)."""
    import cv2
    stego_o, meta_o, _ = oracle.embed_gray(cover, wm, 0.12, PW, NONCE)
    sp = str(tmp_path / "stego_o.png")
    mp = str(tmp_path / "meta_o.npz")
    cv2.imwrite(sp, stego_o, [cv2.IMWRITE_PNG_COMPRESSION, 0])
    np.savez_compressed(mp, **meta_o)

    found, score = api.detect(sp, mp)
    score_o = oracle.detect(stego_o, meta_o)
    assert found
    assert abs(score - score_o) < 1e-3

    out = api.extract(sp, mp, str(tmp_path / "wm_o.png"), password=PW,
                      enhance=False)
    got = cv2.imread(out, cv2.IMREAD_GRAYSCALE)
    raw_o = oracle.extract_gray_raw(stego_o, meta_o, PW)
    assert oracle.nc(got, raw_o) > 0.98


def test_color_roundtrip(tmp_path, cover, wm):
    cp, wp = _paths(tmp_path, cover, wm)
    out, meta_p, ps, ss = api.embed(
        cp, wp, str(tmp_path / "stego.png"), str(tmp_path / "meta.npz"),
        alpha=0.12, color=True, password=PW)
    assert ps > 20
    found, score = api.detect(out, meta_p)
    assert found and score > 0.9

    # bit-level parity with the reference color extract (oracle
    # transcription of app_dct_svd_single.py:232-275), same standard the
    # gray path is held to — nc>0.5 vs the resized watermark alone could
    # not catch swapped channel keys or a per-channel permutation
    import cv2
    wm_out = api.extract(out, meta_p, str(tmp_path / "wm_c.png"),
                         password=PW, enhance=False)
    got = cv2.imread(wm_out)                       # BGR
    stego_img = cv2.imread(out)
    data = dict(np.load(meta_p, allow_pickle=False))
    raw_o = oracle.extract_color_raw(stego_img, data, PW)
    assert oracle.nc(got, raw_o) > 0.98
    for c in range(3):                             # per-channel, not pooled
        assert oracle.nc(got[..., c], raw_o[..., c]) > 0.95, c

    import cv2
    stego_img = cv2.imread(out)
    data = dict(np.load(meta_p, allow_pickle=False))
    score_o = oracle.detect(stego_img, data)
    assert abs(score - score_o) < 1e-3

    wm_out = api.extract(out, meta_p, str(tmp_path / "wm_out.png"),
                         password=PW, enhance=False)
    got = cv2.imread(wm_out)
    wm_ref = cv2.resize(wm, (160, 128), interpolation=cv2.INTER_AREA)
    assert oracle.nc(got, wm_ref) > 0.5


def test_wrong_password_rejected(tmp_path, cover, wm):
    cp, wp = _paths(tmp_path, cover, wm)
    out, meta_p, _, _ = api.embed(
        cp, wp, str(tmp_path / "s.png"), str(tmp_path / "m.npz"),
        alpha=0.12, password=PW)
    with pytest.raises(ValueError):
        api.extract(out, meta_p, str(tmp_path / "x.png"), password="wrong")


def test_detect_clean_host_scores_zero(tmp_path, cover, wm):
    cp, wp = _paths(tmp_path, cover, wm)
    _, meta_p, _, _ = api.embed(
        cp, wp, str(tmp_path / "s.png"), str(tmp_path / "m.npz"),
        alpha=0.12, password=PW)
    found, score = api.detect(cp, meta_p)  # the unwatermarked cover
    assert not found
    assert abs(score) < 0.35


def test_secure_meta_requires_password(tmp_path, cover, wm):
    """A password-protected meta must refuse extraction without the
    password (password=None is only valid for open-mode metas)."""
    cp, wp = _paths(tmp_path, cover, wm)
    out, mp, *_ = api.embed(cp, wp, str(tmp_path / "s.png"),
                            str(tmp_path / "m.npz"), password="pw")
    with pytest.raises(ValueError):
        api.extract(out, mp, str(tmp_path / "x.png"), password=None)


@pytest.mark.parametrize("method", ["full", "blocked"])
def test_open_mode_roundtrip(tmp_path, make_image, method):
    """password=OPEN_MODE = the legacy core's open mode: no permutation,
    no HMAC, meta carries no nonce/digest keys (ref: dct_svd_core_secure.py
    :101-150); extraction works without a password."""
    import cv2
    cover = make_image(96, 96)
    wm = make_image(48, 48, blur=False)
    cp, wp = str(tmp_path / "c.png"), str(tmp_path / "w.png")
    cv2.imwrite(cp, cover)
    cv2.imwrite(wp, wm)
    out, mp, ps, _ = api.embed(cp, wp, str(tmp_path / "s.png"),
                               str(tmp_path / "m.npz"), alpha=0.12,
                               password=api.OPEN_MODE, method=method)
    assert ps > 20
    with np.load(mp) as data:
        assert "nonce" not in data and "digest" not in data
    found, score = api.detect(out, mp)
    assert found and score > 0.8
    got = api.extract(out, mp, str(tmp_path / "x.png"), password=None,
                      enhance=False)
    ref = cv2.cvtColor(cv2.resize(wm, (96, 96),
                                  interpolation=cv2.INTER_AREA),
                       cv2.COLOR_BGR2GRAY)
    assert oracle.nc(cv2.imread(got, cv2.IMREAD_GRAYSCALE), ref) > 0.5


def test_passwordless_embed_warns(tmp_path, cover, wm):
    """VERDICT r2 #5: the insecure open mode must be explicit. A bare
    password=None embed emits a UserWarning (the reference's authoritative
    core refuses outright, ref: app_dct_svd_single.py:115-116);
    password=OPEN_MODE and real passwords embed silently."""
    import warnings
    cp, wp = _paths(tmp_path, cover, wm)

    with pytest.warns(UserWarning, match="open-mode"):
        api.embed(cp, wp, str(tmp_path / "s1.png"),
                  str(tmp_path / "m1.npz"), password=None)
    with pytest.warns(UserWarning, match="open-mode"):
        api.embed_payload(cp, "x", str(tmp_path / "s2.png"),
                          str(tmp_path / "m2.npz"))

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        api.embed(cp, wp, str(tmp_path / "s3.png"),
                  str(tmp_path / "m3.npz"), password=api.OPEN_MODE)
        api.embed(cp, wp, str(tmp_path / "s4.png"),
                  str(tmp_path / "m4.npz"), password=PW)
        api.embed_payload(cp, "x", str(tmp_path / "s5.png"),
                          str(tmp_path / "m5.npz"), password=api.OPEN_MODE)


def test_meta_npz_suffix_and_extra_roundtrip(tmp_path):
    """np.savez appends '.npz' to suffix-less paths: the savers must
    return the REAL on-disk path and loaders accept either spelling; and
    caller ``extra`` keys that collide with video-meta scalar names
    ('text', 'font_size') must survive a save->load round trip instead of
    being silently dropped (code-review r3)."""
    import os
    from dctsvd_tpu.io import meta as metaio
    p = str(tmp_path / "img.meta")
    ret = metaio.save_gray_meta(
        p, sc=np.zeros(4, np.float32), uw=np.eye(4, dtype=np.float32),
        vwt=np.eye(4, dtype=np.float32), sw=np.zeros(4, np.float32),
        shape=(4, 4), alpha=0.1, kfrac=0.6, nonce=None, digest=None,
        extra={"text": "hello", "font_size": 40})
    assert ret.endswith(".npz") and os.path.exists(ret), ret
    for load_from in (p, ret):
        m = metaio.load_meta(load_from)
        assert str(m.arrays["text"]) == "hello"
        assert int(m.arrays["font_size"]) == 40

    vp = str(tmp_path / "vid.ckpt")
    vm = metaio.VideoMeta(
        frame_indices=np.arange(2), s_orig=np.zeros((2, 4), np.float32),
        uw=np.eye(4, dtype=np.float32), sw=np.zeros(4, np.float32),
        vtw=np.eye(4, dtype=np.float32), alpha=0.05, frame_interval=5,
        watermark_shape=(4, 4))
    vret = metaio.save_video_meta(vp, vm)
    assert vret.endswith(".npz") and os.path.exists(vret)
    back = metaio.load_video_meta(vp)      # either spelling loads
    assert back.frame_interval == 5


def test_blocked_meta_tamper_rejected(tmp_path, cover, wm):
    """The blocked meta's HMAC authenticates EVERYTHING extraction
    consumes — Sw, alpha, kfrac, sweeps, shape, mode — not just the
    reference-order Sc/Uw/Vwt (code-review r3: a tampered Sw blanked the
    output via the clamp and an edited alpha rescaled it, all behind a
    passing digest check)."""
    cp, wp = _paths(tmp_path, cover, wm)
    out, meta_p, _, _ = api.embed(
        cp, wp, str(tmp_path / "s.png"), str(tmp_path / "m.npz"),
        alpha=0.12, password=PW, method="blocked")

    def tampered(**edits):
        with np.load(meta_p, allow_pickle=False) as z:
            data = {k: z[k] for k in z.files}
        data.update(edits)
        tp = str(tmp_path / "tampered.npz")
        np.savez_compressed(tp, **data)
        return tp

    ok = api.extract(out, meta_p, str(tmp_path / "ok.png"), password=PW,
                     enhance=False)
    assert ok  # untampered meta still verifies after the coverage change

    with np.load(meta_p, allow_pickle=False) as z:
        sw = z["Sw"]
    for edits in ({"Sw": np.zeros_like(sw)},
                  {"alpha": np.float64(0.3)},
                  # CPU embeds record sweeps=0, so flip it to a non-0
                  # schedule (0 would be a no-op tamper here)
                  {"sweeps": np.int64(3)},
                  {"kfrac": np.float64(0.9)}):
        with pytest.raises(ValueError, match="HMAC"):
            api.extract(out, tampered(**edits),
                        str(tmp_path / "x.png"), password=PW)


def test_blocked_meta_legacy_v1_digest_still_extracts(tmp_path, cover, wm):
    """Expanding the blocked digest's coverage (round 3) must not brick
    metas written by earlier builds: a meta carrying the legacy
    Sc/Uw/Vwt-only digest and NO digest_v key verifies against the v1
    schema and extracts (advisor r3 — previously it failed with a
    misleading wrong-password error)."""
    from dctsvd_tpu.models import blocked as m_blocked
    from dctsvd_tpu.utils import crypto
    cp, wp = _paths(tmp_path, cover, wm)
    out, meta_p, _, _ = api.embed(
        cp, wp, str(tmp_path / "s.png"), str(tmp_path / "m.npz"),
        alpha=0.12, password=PW, method="blocked")

    # rewrite as a pre-round-3 build would have: v1 digest, no digest_v
    with np.load(meta_p, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}
    data.pop("digest_v")
    key = crypto.derive_key(PW, bytes(data["nonce"].tobytes()))
    data["digest"] = np.frombuffer(
        m_blocked._digest_v1(key, data["Sc"], data["Uw"], data["Vwt"]),
        np.uint8)
    legacy_p = str(tmp_path / "legacy.npz")
    np.savez_compressed(legacy_p, **data)

    outp = api.extract(out, legacy_p, str(tmp_path / "legacy_wm.png"),
                       password=PW, enhance=False)
    assert os.path.exists(outp)
    # wrong password still rejected on the v1 path
    with pytest.raises(ValueError, match="HMAC"):
        api.extract(out, legacy_p, str(tmp_path / "x.png"),
                    password="not-the-password")
    # and a new-format meta whose digest_v was stripped (downgrade
    # attempt) fails v1 verification rather than passing anything
    with np.load(meta_p, allow_pickle=False) as z:
        d2 = {k: z[k] for k in z.files}
    d2.pop("digest_v")
    down_p = str(tmp_path / "down.npz")
    np.savez_compressed(down_p, **d2)
    with pytest.raises(ValueError, match="HMAC"):
        api.extract(out, down_p, str(tmp_path / "y.png"), password=PW)
