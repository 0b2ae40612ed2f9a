"""Timeline instrumentation for the video embed loop (round-5 overlap gap).

exp_video_overlap.py established: one-dispatch run (A) 5.4 s vs 2.7 s
codec-only; bench config (B) 7.8 s; big ordered buffer barely helps.
~2-4 s is lost somewhere the queue-bound theory does not explain.  This
tool runs the REAL loop with monkeypatched probes and prints a stage
timeline so the loss is attributable:

  decode   per-frame yield timestamps from iter_frames_threaded
  encode   AsyncEncoder writer busy time + starvation gaps > 100 ms
  dispatch submit -> future-resolve spans for every device chunk
  sampler  50 ms samples of encode-queue depth

Run: python tools/exp_video_timeline.py [interval]
"""
import os as _os
import sys as _sys
import tempfile
import threading
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere


def main():
    import cv2
    from dctsvd_tpu.io import video_io
    from dctsvd_tpu.models import video as m_video

    interval = int(_sys.argv[1]) if len(_sys.argv) > 1 else 10

    tmp = tempfile.mkdtemp(prefix="dctsvd_vtl_")
    host = f"{tmp}/host.mp4"
    rng = np.random.default_rng(0)
    vw = cv2.VideoWriter(host, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                         (1920, 1080))
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (1080, 1920, 3), np.uint8).astype(np.uint8),
        (0, 0), 3)
    for i in range(150):
        vw.write(np.roll(base, 7 * i, axis=1))
    vw.release()
    wm = rng.integers(0, 256, (1080, 1920), np.uint8)

    # warm compile outside the instrumented run
    m_video._embed_video_impl(host, f"{tmp}/warm.mp4", f"{tmp}/warm.npz",
                              wm, alpha=0.1, frame_interval=75,
                              color=False, chunk=4, scheme="blocked")

    ev = []                        # (t, tag, payload)
    t0 = [0.0]

    def stamp(tag, payload=""):
        ev.append((time.time() - t0[0], tag, payload))

    # --- probe 1: decode yields
    real_iter = video_io.iter_frames_threaded

    def iter_probe(reader, start_frame=0, queue_size=48):
        for idx, frame in real_iter(reader, start_frame=start_frame,
                                    queue_size=queue_size):
            stamp("decode", idx)
            yield idx, frame
        stamp("decode_done")

    # --- probe 2: encoder busy/idle
    real_write = video_io.VideoWriter.write

    def write_probe(self, frame):
        s = time.time() - t0[0]
        real_write(self, frame)
        ev.append((s, "enc", round(time.time() - t0[0] - s, 4)))

    # --- probe 3: dispatch spans
    real_dispatch = None

    def run():
        nonlocal real_dispatch
        t0[0] = time.time()
        m_video._embed_video_impl(host, f"{tmp}/out.mp4", f"{tmp}/m.npz",
                                  wm, alpha=0.1, frame_interval=interval,
                                  color=False, chunk=4, scheme="blocked")
        stamp("all_done")

    # dispatch probe: wrap the embed fns the worker thread calls
    real_gray = m_video._embed_frame_gray_blocked

    def gray_probe(planes, sw, alpha, **kw):
        s = time.time() - t0[0]
        out = real_gray(planes, sw, alpha, **kw)
        # the fn returns device arrays; to_numpy happens in the caller —
        # time the device call only here, the caller stamps the d2h side
        ev.append((s, "embed_call", round(time.time() - t0[0] - s, 4)))
        return out

    real_to_numpy = m_video.to_numpy

    def to_numpy_probe(x):
        s = time.time() - t0[0]
        out = real_to_numpy(x)
        dt = time.time() - t0[0] - s
        if dt > 0.02:
            ev.append((s, "d2h", round(dt, 4)))
        return out

    video_io.iter_frames_threaded = iter_probe
    video_io.VideoWriter.write = write_probe
    m_video._embed_frame_gray_blocked = gray_probe
    m_video.to_numpy = to_numpy_probe
    try:
        run()
    finally:
        video_io.iter_frames_threaded = real_iter
        video_io.VideoWriter.write = real_write
        m_video._embed_frame_gray_blocked = real_gray
        m_video.to_numpy = real_to_numpy

    total = ev[-1][0]
    decs = [(t, p) for t, tag, p in ev if tag == "decode"]
    encs = [(t, p) for t, tag, p in ev if tag == "enc"]
    print(f"interval={interval}  total={total:.2f}s "
          f"({150 / total:.1f} fps e2e)")
    print(f"decode: first {decs[0][0]:.2f}s last {decs[-1][0]:.2f}s "
          f"({len(decs)} frames)")
    enc_busy = sum(d for _, d in encs)
    print(f"encode: {len(encs)} writes, busy {enc_busy:.2f}s, first "
          f"{encs[0][0]:.2f}s last {encs[-1][0] + encs[-1][1]:.2f}s")
    # starvation gaps between consecutive encoder writes
    gaps = []
    for (a, da), (b, _db) in zip(encs, encs[1:]):
        g = b - (a + da)
        if g > 0.1:
            gaps.append((round(a + da, 2), round(g, 2)))
    print(f"encoder idle gaps >100ms: {gaps}")
    for t, tag, p in ev:
        if tag in ("embed_call", "d2h", "decode_done", "all_done"):
            print(f"  {t:6.2f}s {tag:12s} {p}")


if __name__ == "__main__":
    main()
