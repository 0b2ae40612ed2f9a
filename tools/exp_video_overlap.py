"""Attribute the video-embed e2e gap (bench --config video) to its
pipeline stages by running the REAL embed loop under varied knobs.

Measured inputs (probe_link.py, this attachment): host->device
35.6 MB/s, ~465 ms round trip per 4-frame gray chunk.  codec-only
(decode+async encode, no device): ~61.8 fps -> 2.43 s for 150 frames.
Link total for 15 marked frames ~ 1.9 s.  Perfect overlap would give
~max(codec, link) + tails ~= 2.6-3 s, yet e2e measures ~6.8 s.

Experiments (all 150-frame 1080p clips, scheme=blocked, gray):
  A  interval=1000 : loop overhead + ONE chunk — isolates the ordered
     buffer/pump machinery from device work
  B  interval=10   : the bench config (baseline ~6.8 s)
  C  interval=10, DCTSVD_VIDEO_MAX_BUFFERED high : does the ordered
     buffer cap (32 < chunk*interval span 40) cause the stall?
  D  interval=10, chunk=2 : smaller dispatch latency, earlier submits

Run: python tools/exp_video_overlap.py
"""
import os as _os
import sys as _sys
import tempfile
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere


def make_clip(path, frames=150, h=1080, w=1920):
    import cv2
    rng = np.random.default_rng(0)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w, 3), np.uint8).astype(np.uint8), (0, 0), 3)
    for i in range(frames):
        vw.write(np.roll(base, 7 * i, axis=1))
    vw.release()


def main():
    import cv2
    from dctsvd_tpu.models import video as m_video

    tmp = tempfile.mkdtemp(prefix="dctsvd_vexp_")
    host = f"{tmp}/host.mp4"
    wmp = f"{tmp}/wm.png"
    make_clip(host)
    rng = np.random.default_rng(1)
    cv2.imwrite(wmp, rng.integers(0, 256, (1080, 1920), np.uint8))

    # compile warmup (2-frame clip, same shapes)
    warm = f"{tmp}/warm.mp4"
    make_clip(warm, frames=2)
    m_video.embed_watermark_video(warm, wmp, f"{tmp}/w.mp4",
                                  f"{tmp}/w.npz", frame_interval=10,
                                  scheme="blocked")

    def run(tag, interval, chunk=4, env=None):
        env = env or {}
        old = {k: _os.environ.get(k) for k in env}
        _os.environ.update(env)
        try:
            t0 = time.time()
            m_video._embed_video_impl(
                host, f"{tmp}/out_{tag}.mp4", f"{tmp}/m_{tag}.npz",
                cv2.imread(wmp, cv2.IMREAD_GRAYSCALE).astype(np.uint8),
                alpha=0.1, frame_interval=interval, color=False,
                chunk=chunk, scheme="blocked")
            dt = time.time() - t0
        finally:
            for k, v in old.items():
                if v is None:
                    _os.environ.pop(k, None)
                else:
                    _os.environ[k] = v
        print(f"{tag:28s} interval={interval:<5d} chunk={chunk} "
              f"{dt:6.2f}s  ({150 / dt:5.1f} fps)", flush=True)
        return dt

    run("A_loop_only", 1000)
    run("B_bench_config", 10)
    run("C_big_buffer", 10,
        env={"DCTSVD_VIDEO_MAX_BUFFERED": "128"})
    run("D_chunk2", 10, chunk=2)
    run("D2_chunk2_bigbuf", 10, chunk=2,
        env={"DCTSVD_VIDEO_MAX_BUFFERED": "128"})


if __name__ == "__main__":
    main()
