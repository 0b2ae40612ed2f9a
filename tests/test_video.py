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


def test_threaded_reader_matches_direct(clip):
    """iter_frames_threaded must yield exactly the frames a direct read
    yields, in order, including from a mid-clip start."""
    with video_io.VideoReader(clip) as r:
        direct = [f.copy() for f in r]
    with video_io.VideoReader(clip) as r:
        threaded = list(video_io.iter_frames_threaded(r))
    assert [i for i, _ in threaded] == list(range(NFRAMES))
    for (_, a), b in zip(threaded, direct):
        np.testing.assert_array_equal(a, b)
    with video_io.VideoReader(clip) as r:
        tail = list(video_io.iter_frames_threaded(r, start_frame=10))
    assert [i for i, _ in tail] == list(range(10, NFRAMES))
    np.testing.assert_array_equal(tail[0][1], direct[10])


def test_blocked_video_roundtrip(tmp_path, clip, wm_png):
    """scheme='blocked' routes video frames through the 8x8 throughput
    path; VideoMeta.scheme round-trips and extraction dispatches on it
    (VERDICT r1 missing #4)."""
    out = str(tmp_path / "marked_b.mp4")
    meta_p = str(tmp_path / "vmeta_b.npz")
    m_video.embed_watermark_video(clip, wm_png, out, meta_p, alpha=0.08,
                                  frame_interval=5, scheme="blocked")
    meta = metaio.load_video_meta(meta_p)
    assert meta.scheme == "blocked"
    n_blocks = (H // 8) * (W // 8)
    assert list(meta.frame_indices) == [0, 5, 10, 15, 20]
    assert meta.s_orig.shape == (5, n_blocks, 8)
    assert meta.uw.shape == (n_blocks, 8, 8)

    wm_out = str(tmp_path / "wm_out_b.png")
    m_video.extract_watermark_video(out, meta_p, wm_out)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.resize(wm_ref, (W, H), interpolation=cv2.INTER_AREA)
    assert oracle.nc(got, wm_ref) > 0.4


def test_blocked_color_video_roundtrip(tmp_path, clip, wm_png):
    out = str(tmp_path / "marked_bc.mp4")
    meta_p = str(tmp_path / "vmeta_bc.npz")
    m_video.embed_watermark_video_color(clip, wm_png, out, meta_p,
                                        alpha=0.08, frame_interval=8,
                                        scheme="blocked")
    meta = metaio.load_video_meta(meta_p)
    assert meta.scheme == "blocked" and meta.is_color
    n_blocks = (H // 8) * (W // 8)
    assert meta.s_orig.shape == (3, 3, n_blocks, 8)
    wm_out = str(tmp_path / "wm_out_bc.png")
    m_video.extract_watermark_video(out, meta_p, wm_out)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.resize(wm_ref, (W, H), interpolation=cv2.INTER_AREA)
    assert oracle.nc(got, wm_ref) > 0.4


def _read_all_frames(path):
    with video_io.VideoReader(path) as r:
        return [f.copy() for f in r]


def test_video_resume_after_interrupt(tmp_path, clip, wm_png, monkeypatch):
    """Kill the embed loop mid-clip, rerun with resume=True, and compare
    against an uninterrupted run (VERDICT r1 next-round #5: deterministic
    resume from the last flushed chunk)."""
    wm = cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE)
    wm_plane = cv2.resize(wm, (W, H), interpolation=cv2.INTER_AREA)

    out_a = str(tmp_path / "a.mp4")
    meta_a = str(tmp_path / "a.npz")
    m_video._embed_video_impl(clip, out_a, meta_a, wm_plane, 0.08, 5,
                              color=False, resume=True, segment_frames=8)
    meta_full = metaio.load_video_meta(meta_a)
    assert list(meta_full.frame_indices) == [0, 5, 10, 15, 20]
    assert meta_full.frames_done == -1      # completed: no resume state

    out_b = str(tmp_path / "b.mp4")
    meta_b = str(tmp_path / "b.npz")
    calls = {"n": 0}
    orig = m_video._embed_frame_gray

    def bomb(planes, sw, alpha):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash")
        return orig(planes, sw, alpha)

    monkeypatch.setattr(m_video, "_embed_frame_gray", bomb)
    with pytest.raises(RuntimeError, match="injected"):
        m_video._embed_video_impl(clip, out_b, meta_b, wm_plane, 0.08, 5,
                                  color=False, resume=True,
                                  segment_frames=8)
    # the crash left finalized segments + a checkpoint meta behind
    ck = metaio.load_video_meta(meta_b)
    assert ck.frames_done > 0 and ck.segments_done >= 1
    assert video_io.SegmentedVideoWriter.existing_segments(out_b)
    assert not os.path.exists(out_b)

    monkeypatch.setattr(m_video, "_embed_frame_gray", orig)
    m_video._embed_video_impl(clip, out_b, meta_b, wm_plane, 0.08, 5,
                              color=False, resume=True, segment_frames=8)
    meta_res = metaio.load_video_meta(meta_b)
    assert list(meta_res.frame_indices) == [0, 5, 10, 15, 20]
    np.testing.assert_array_equal(meta_res.s_orig, meta_full.s_orig)
    assert not video_io.SegmentedVideoWriter.existing_segments(out_b)

    with open(out_a, "rb") as fa, open(out_b, "rb") as fb:
        assert fa.read() == fb.read()      # byte-identical to uninterrupted

    wm_out = str(tmp_path / "wm_res.png")
    m_video.extract_watermark_video(out_b, meta_b, wm_out)
    got = cv2.imread(wm_out, cv2.IMREAD_GRAYSCALE)
    wm_ref = cv2.resize(wm, (W, H), interpolation=cv2.INTER_AREA)
    assert oracle.nc(got, wm_ref) > 0.4


def test_resume_ignores_mismatched_checkpoint(tmp_path, clip, wm_png):
    """A checkpoint written with different parameters must not be resumed
    from (fresh start instead)."""
    wm = cv2.imread(wm_png, cv2.IMREAD_GRAYSCALE)
    wm_plane = cv2.resize(wm, (W, H), interpolation=cv2.INTER_AREA)
    out = str(tmp_path / "c.mp4")
    meta_p = str(tmp_path / "c.npz")
    sw_now = np.asarray(m_video._wm_svd(wm_plane)[1])
    sig = m_video._host_signature(clip)
    state = m_video._load_resume_state(meta_p, out, "full", 0.08, 5, False,
                                       sw_now, 1.0, sig)
    assert state is None                    # no meta at all
    m_video._embed_video_impl(clip, out, meta_p, wm_plane, 0.05, 5,
                              color=False, resume=True, segment_frames=8)
    # different alpha -> rejected
    assert m_video._load_resume_state(meta_p, out, "full", 0.08, 5, False,
                                      sw_now, 1.0, sig) is None

    # forge a mid-run checkpoint (a completed meta has frames_done=-1 and
    # short-circuits before the identity checks)
    import dataclasses
    prev = metaio.load_video_meta(meta_p)
    metaio.save_video_meta(meta_p, dataclasses.replace(
        prev, frames_done=8, segments_done=1))
    seg0 = out + ".seg0000.mp4"
    with open(seg0, "wb") as f:
        f.write(b"segment-placeholder")
    try:
        # matching watermark + params -> accepted
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now, 1.0, sig) is not None
        # different WATERMARK (sw mismatch) -> rejected, same params
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now * 1.5, 1.0,
                                          sig) is None
        # different kfrac -> rejected (ADVICE r2: kfrac was unvalidated)
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now, 0.6, sig) is None
        # different host file identity -> rejected (ADVICE r2: the
        # checkpoint is bound to the host video it started from)
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now, 1.0,
                                          "other.mp4:123:456") is None
        # different Jacobi sweep schedule -> rejected (code-review r3:
        # splicing segments embedded under different schedules leaves the
        # final meta recording only the last run's count, silently
        # breaking extraction's replay for the earlier frames)
        import dataclasses as _dc
        metaio.save_video_meta(meta_p, _dc.replace(
            metaio.load_video_meta(meta_p), sweeps=1))
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now, 1.0, sig) is None
        metaio.save_video_meta(meta_p, _dc.replace(
            metaio.load_video_meta(meta_p), sweeps=0))
        # legacy checkpoint without host_sig stays resumable
        metaio.save_video_meta(meta_p, _dc.replace(
            metaio.load_video_meta(meta_p), host_sig=""))
        assert m_video._load_resume_state(meta_p, out, "full", 0.05, 5,
                                          False, sw_now, 1.0, sig) is not None
    finally:
        os.remove(seg0)


def test_stale_segments_cleaned(tmp_path):
    """ADVICE r2: a fresh SegmentedVideoWriter must delete higher-index
    segments from a stale earlier run, and finalize() must not leave
    orphans behind."""
    base = str(tmp_path / "v.mp4")
    for i in range(3):
        with open(f"{base}.seg{i:04d}.mp4", "wb") as f:
            f.write(b"stale")
    w = video_io.SegmentedVideoWriter(base, 10, 32, 16)
    # fresh start (segment 0): every stale segment is gone
    assert video_io.SegmentedVideoWriter.existing_segments(base) == []
    frame = np.zeros((16, 32, 3), np.uint8)
    for _ in range(4):
        w.write(frame)
    w.roll()
    # forge a stale higher-index segment appearing mid-run; finalize must
    # drop it rather than leave it on disk
    with open(f"{base}.seg0007.mp4", "wb") as f:
        f.write(b"stale")
    w.finalize()
    assert os.path.exists(base)
    assert video_io.SegmentedVideoWriter.existing_segments(base) == []


def test_video_meta_sweeps_roundtrip(tmp_path):
    """ADVICE r2: the embed-time Jacobi sweep schedule rides the meta so
    extract/detect replay it (convergence residual cancellation)."""
    from dctsvd_tpu.models import blocked as m_blocked
    m = metaio.VideoMeta(
        frame_indices=np.array([0, 5]), s_orig=np.zeros((2, 4), np.float32),
        uw=np.eye(4, dtype=np.float32), sw=np.ones(4, np.float32),
        vtw=np.eye(4, dtype=np.float32), alpha=0.1, frame_interval=5,
        watermark_shape=(4, 4), scheme="blocked", kfrac=0.6, sweeps=3,
        host_sig="clip.mp4:1:2")
    p = str(tmp_path / "m.npz")
    metaio.save_video_meta(p, m)
    back = metaio.load_video_meta(p)
    assert back.sweeps == 3 and back.host_sig == "clip.mp4:1:2"
    assert m_blocked.replay_sweeps(back.sweeps) == 3
    # 0 = converged/XLA embed -> replay at the kernel-default schedule
    from dctsvd_tpu.ops import wm_pallas
    assert m_blocked.replay_sweeps(0) == wm_pallas._SWEEPS_DEFAULT


def test_async_encoder_order_and_errors(tmp_path):
    """AsyncEncoder preserves FIFO write/roll order (segment boundaries
    byte-identical to the synchronous writer) and surfaces encoder-thread
    failures on the caller's side."""
    base = str(tmp_path / "ae.mp4")
    w = video_io.SegmentedVideoWriter(base, 10, 32, 16)
    enc = video_io.AsyncEncoder(w)
    frame = np.zeros((16, 32, 3), np.uint8)
    for i in range(5):
        enc.write(frame + i * 10)
    assert enc.sync_roll() == 5            # all queued frames drained first
    for _ in range(3):
        enc.write(frame)
    enc.close()
    w.close()
    segs = video_io.SegmentedVideoWriter.existing_segments(base)
    assert len(segs) == 2
    with video_io.VideoReader(segs[0]) as r:
        assert sum(1 for _ in r) == 5
    with video_io.VideoReader(segs[1]) as r:
        assert sum(1 for _ in r) == 3

    class Boom:
        def write(self, f):
            raise IOError("disk full")

        def roll(self):
            return 0

    enc = video_io.AsyncEncoder(Boom())
    enc.write(frame)
    with pytest.raises(IOError, match="disk full"):
        for _ in range(100):               # surfaces on a subsequent call
            enc.write(frame)
    with pytest.raises(IOError):
        enc.close()


def test_async_encoder_use_after_close(tmp_path):
    """write()/sync_roll() after close() must raise, not silently queue
    frames no thread will ever drain (advisor r3); close() is
    idempotent."""
    base = str(tmp_path / "uac.mp4")
    with video_io.SegmentedVideoWriter(base, 10, 32, 16) as w:
        enc = video_io.AsyncEncoder(w)
        enc.write(np.zeros((16, 32, 3), np.uint8))
        enc.close()
        enc.close()                         # idempotent
        with pytest.raises(RuntimeError, match="after close"):
            enc.write(np.zeros((16, 32, 3), np.uint8))
        with pytest.raises(RuntimeError, match="after close"):
            enc.sync_roll()
