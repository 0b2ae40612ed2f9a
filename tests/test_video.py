"""Video integration tests (SURVEY.md §4.5): synthetic clips, gray/color
embed→extract round trips, text watermarks, statistical detect, legacy
pickled-meta compatibility, and the ffmpeg graceful-degradation contract."""

import os

import cv2
import numpy as np
import pytest

import oracle
from dctsvd_tpu.io import meta as metaio
from dctsvd_tpu.io import video_io
from dctsvd_tpu.models import video as m_video
from dctsvd_tpu.models.text import create_text_watermark


H, W, NFRAMES = 96, 128, 24


@pytest.fixture()
def clip(tmp_path, rng):
    """Synthetic moving-gradient clip."""
    path = str(tmp_path / "clip.mp4")
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (H, W, 3), np.uint8), (0, 0), 3.0)
    with video_io.VideoWriter(path, 24.0, W, H) as w:
        for i in range(NFRAMES):
            frame = np.roll(base, i * 2, axis=1)
            w.write(frame)
    return path


@pytest.fixture()
def wm_png(tmp_path, rng):
    p = str(tmp_path / "wm.png")
    wm = np.zeros((48, 48), np.uint8)
    cv2.circle(wm, (24, 24), 16, 255, -1)
    cv2.imwrite(p, wm)
    return p


def test_video_info(clip):
    info = m_video.get_video_info(clip)
    assert info["width"] == W and info["height"] == H
    assert info["total_frames"] == NFRAMES
    assert info["duration_seconds"] == pytest.approx(NFRAMES / 24.0)


def test_gray_video_roundtrip(tmp_path, clip, wm_png):
    out = str(tmp_path / "marked.mp4")
    meta_p = str(tmp_path / "vmeta.npz")
    m_video.embed_watermark_video(clip, wm_png, out, meta_p, alpha=0.08,
                                  frame_interval=5)
    assert os.path.exists(out)
    meta = metaio.load_video_meta(meta_p)
    assert list(meta.frame_indices) == [0, 5, 10, 15, 20]
    assert meta.s_orig.shape == (5, min(H, W))
    assert not meta.is_color

    wm_out = str(tmp_path / "wm_out.png")
    m_video.extract_watermark_video(out, meta_p, wm_out)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.resize(wm_ref, (W, H), interpolation=cv2.INTER_AREA)
    # mp4v is lossy; the averaged estimate should still correlate
    assert oracle.nc(got, wm_ref) > 0.4


def test_color_video_roundtrip(tmp_path, clip, wm_png):
    out = str(tmp_path / "marked_c.mp4")
    meta_p = str(tmp_path / "vmeta_c.npz")
    m_video.embed_watermark_video_color(clip, wm_png, out, meta_p,
                                        alpha=0.08, frame_interval=6)
    meta = metaio.load_video_meta(meta_p)
    assert meta.is_color
    assert meta.s_orig.shape == (4, 3, min(H, W))

    wm_out = str(tmp_path / "wm_out_c.png")
    m_video.extract_watermark_video(out, meta_p, wm_out)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.resize(cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE), (W, H),
                        interpolation=cv2.INTER_AREA)
    assert oracle.nc(got, wm_ref) > 0.4


def test_text_video_roundtrip(tmp_path, clip):
    out = str(tmp_path / "marked_t.mp4")
    meta_p = str(tmp_path / "vmeta_t.npz")
    m_video.embed_text_watermark_video(clip, "HELLO", out, meta_p,
                                       alpha=0.08, frame_interval=8)
    meta = metaio.load_video_meta(meta_p)
    assert meta.is_text and meta.text == "HELLO"
    got_text = m_video.extract_text_watermark_video(
        out, meta_p, str(tmp_path / "wm_t.png"))
    assert got_text == "HELLO"


def test_detect_statistics(clip):
    stats = m_video.detect_watermark_video(clip, frame_sample_rate=6)
    assert "watermark_likelihood" in stats
    assert stats["total_frames_analyzed"] == 4
    assert 0.0 < stats["watermark_likelihood"] <= 1.0
    bad = m_video.detect_watermark_video("/does/not/exist.mp4")
    assert "error" in bad


def test_legacy_pickled_meta_reader(tmp_path, rng):
    """The reference saves original_singular_values as a pickled list
    (gray: [L] arrays; color: {'B','G','R'} dicts). Our loader must read
    both (SURVEY.md §2.3 'allow_pickle liability')."""
    l = 32
    uw = rng.normal(size=(H, l)).astype(np.float64)
    sw = rng.random(l)
    vtw = rng.normal(size=(l, W)).astype(np.float64)
    # gray legacy
    p1 = str(tmp_path / "legacy_gray.npz")
    np.savez(p1,
             watermark_frames=[0, 10, 20],
             original_singular_values=[rng.random(l) for _ in range(3)],
             Uw=uw, Sw=sw, Vtw=vtw, alpha=0.05, frame_interval=10,
             watermark_shape=(H, W))
    m1 = metaio.load_video_meta(p1)
    assert m1.s_orig.shape == (3, l)
    assert not m1.is_color
    # color legacy with dicts (object array -> pickle)
    p2 = str(tmp_path / "legacy_color.npz")
    svs = np.empty(2, object)
    svs[:] = [{"B": rng.random(l), "G": rng.random(l), "R": rng.random(l)}
              for _ in range(2)]
    np.savez(p2, watermark_frames=[0, 10], original_singular_values=svs,
             Uw=uw, Sw=sw, Vtw=vtw, alpha=0.05, frame_interval=10,
             watermark_shape=(H, W), is_color=True,
             is_text_watermark=False)
    m2 = metaio.load_video_meta(p2)
    assert m2.is_color
    assert m2.s_orig.shape == (2, 3, l)


def test_audio_contract_graceful(tmp_path, clip, wm_png, monkeypatch):
    """No ffmpeg binary in this image: the with-audio variant must fall
    back to renaming the silent video into place and report False."""
    out = str(tmp_path / "aud.mp4")
    meta_p = str(tmp_path / "aud_meta.npz")
    outp, metap, had_audio = m_video.embed_watermark_video_color_with_audio(
        clip, wm_png, out, meta_p, alpha=0.08, frame_interval=8)
    assert os.path.exists(out)
    assert not os.path.exists(out + ".temp.mp4")
    assert had_audio is False


def test_ffmpeg_runner_mocked(tmp_path, monkeypatch):
    """Stub the ffmpeg runner to verify the success path's command contract
    (SURVEY.md §4.5)."""
    calls = {}

    def fake_run(cmd, capture_output=None, timeout=None):
        calls["cmd"] = cmd
        calls["timeout"] = timeout

        class R:
            returncode = 0
        if cmd[1] == "-version":
            return R()
        open(cmd[-1], "wb").write(b"x")  # the "final" output
        return R()

    monkeypatch.setattr(video_io.subprocess, "run", fake_run)
    vo = str(tmp_path / "vo.mp4")
    orig = str(tmp_path / "orig.mp4")
    final = str(tmp_path / "final.mp4")
    open(vo, "wb").write(b"v")
    open(orig, "wb").write(b"o")
    ok = video_io.preserve_audio_with_ffmpeg(vo, orig, final)
    assert ok
    assert calls["cmd"][:2] == ["ffmpeg", "-y"]
    assert "-c:v" in calls["cmd"] and "copy" in calls["cmd"]
    assert "-shortest" in calls["cmd"]
    assert calls["timeout"] == 60.0


def test_text_rasterizer():
    wm = create_text_watermark("AB", (128, 64), 30)
    assert wm.shape == (64, 128)
    assert wm.dtype == np.uint8
    assert wm.max() == 255 and wm.min() == 0  # something was drawn
