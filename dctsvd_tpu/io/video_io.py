"""Host-boundary video IO + the ffmpeg audio-preservation contract.

Decode/encode happen on host via OpenCV (mp4v fourcc like the reference,
ref: video_dct_svd.pyc l.104-105); frames stream to the device in fixed-size
chunks so the jit graphs see static shapes and the HBM never holds a whole
clip. Audio is preserved by remuxing with an ffmpeg subprocess — the only
process boundary in the whole system, identical command contract to the
reference (ref: video_dct_svd.pyc l.12-54): probe `ffmpeg -version` with a
5 s timeout, then `ffmpeg -y -i video_only -i original -c:v copy -c:a aac
-map 0:v:0 -map 1:a:0 -shortest final` with a 60 s timeout, returning False
(graceful degradation to silent video) on any failure.
"""

from __future__ import annotations

import os
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAVE_CV2 = False


class VideoReader:
    def __init__(self, path: str):
        if not _HAVE_CV2:
            raise RuntimeError("cv2 required for video IO")
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise ValueError(f"Cannot open video: {path}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self.cap.read()
            if not ok:
                return
            yield frame

    def seek_read(self, index: int) -> Optional[np.ndarray]:
        """Positioned read (ref extract seeks CAP_PROP_POS_FRAMES,
        ref: video_dct_svd.pyc l.206-210)."""
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, index)
        ok, frame = self.cap.read()
        return frame if ok else None

    def close(self):
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class VideoWriter:
    def __init__(self, path: str, fps: float, width: int, height: int,
                 fourcc: str = "mp4v"):
        if not _HAVE_CV2:
            raise RuntimeError("cv2 required for video IO")
        self.writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fourcc), fps, (width, height),
            True)
        if not self.writer.isOpened():
            raise IOError(f"Cannot open video writer: {path}")

    def write(self, frame_bgr: np.ndarray):
        self.writer.write(frame_bgr)

    def close(self):
        self.writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def get_video_info(path: str) -> Dict:
    """{fps, width, height, total_frames, duration_seconds}
    (ref: video_dct_svd.pyc l.518-533)."""
    with VideoReader(path) as r:
        fps = r.fps
        return dict(fps=fps, width=r.width, height=r.height,
                    total_frames=r.total_frames,
                    duration_seconds=r.total_frames / fps if fps else 0.0)


def ffmpeg_available(timeout: float = 5.0) -> bool:
    try:
        res = subprocess.run(["ffmpeg", "-version"], capture_output=True,
                             timeout=timeout)
        return res.returncode == 0
    except (subprocess.TimeoutExpired, FileNotFoundError, Exception):
        return False


def preserve_audio_with_ffmpeg(video_only: str, original: str,
                               final: str, timeout: float = 60.0) -> bool:
    """Remux audio from `original` onto `video_only` into `final`.
    Returns False on any failure (caller falls back to the silent video),
    matching the reference contract (ref: video_dct_svd.pyc l.12-54)."""
    if not ffmpeg_available():
        return False
    cmd = ["ffmpeg", "-y", "-i", video_only, "-i", original,
           "-c:v", "copy", "-c:a", "aac",
           "-map", "0:v:0", "-map", "1:a:0", "-shortest", final]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=timeout)
        return res.returncode == 0 and os.path.exists(final)
    except (subprocess.TimeoutExpired, Exception):
        return False


def finalize_with_audio(temp_video: str, original: str, out_path: str,
                        want_audio: bool) -> bool:
    """The with-audio variants' finalize step: try the remux, else rename
    the silent temp into place (ref: color_video_dct_svd_with_audio.pyc
    l.161-179)."""
    if want_audio and preserve_audio_with_ffmpeg(temp_video, original,
                                                 out_path):
        os.remove(temp_video)
        return True
    os.replace(temp_video, out_path)
    return False
