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

import glob
import os
import queue
import subprocess
import threading
from typing import Dict, Iterator, List, Optional, Tuple

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


def iter_frames_threaded(reader: "VideoReader", start_frame: int = 0,
                         queue_size: int = 48
                         ) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (index, frame) with decode running in a background thread.

    Decode overlaps the consumer's encode/device work — on a multi-core
    host this pipelines fully; on a single-vCPU host it still overlaps
    decode with device-tunnel WAIT time (the round-1 video bottleneck).
    The queue is bounded so at most ``queue_size`` frames of host RAM are
    in flight. Exceptions in the decoder thread re-raise at the consumer.
    If the consumer exits early (e.g. a dispatch failure unwinding toward
    resume), the producer is stopped and JOINED before returning —
    cv2.VideoCapture is not thread-safe, so the reader must not be
    released while the producer is mid-read.
    """
    q: "queue.Queue" = queue.Queue(maxsize=queue_size)
    _SENTINEL = object()
    stop = threading.Event()

    def _producer():
        try:
            if start_frame:
                reader.cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
            idx = start_frame
            while not stop.is_set():
                ok, frame = reader.cap.read()
                if not ok:
                    break
                while not stop.is_set():
                    try:
                        q.put((idx, frame), timeout=0.1)
                        break
                    except queue.Full:
                        continue
                idx += 1
            q.put(_SENTINEL)
        except BaseException as e:  # surface decode errors to the consumer
            q.put(e)

    t = threading.Thread(target=_producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while t.is_alive():      # drain so a blocked put can observe stop
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.1)


class AsyncEncoder:
    """Pipeline stage that moves mp4 encoding off the caller's thread.

    The embed loop's main thread previously interleaved encoding with
    coordinating device dispatches — on a tunnel-attached chip the encode
    was serialized against the host-link WAIT instead of overlapping it
    (VERDICT r2 #3). This wraps any writer (VideoWriter or
    SegmentedVideoWriter) with a bounded FIFO consumed by one encoder
    thread: ``write`` enqueues, ``sync_roll`` drains the queue up to the
    roll and returns the durable frame count (so checkpoint consistency is
    unchanged — a checkpoint never claims frames that are not on disk),
    and ``close`` drains and joins. FIFO order preserves the exact
    write/roll sequence of the synchronous version, so segment boundaries
    — and therefore resumed outputs — stay byte-identical.

    Encoder-thread exceptions (disk full, codec failure) re-raise on the
    caller's next ``write``/``sync_roll``/``close``.
    """

    _ROLL = "roll"

    def __init__(self, writer, queue_size: int = 16):
        # 16, not larger: every queued frame is host RAM (~24 MB at 4K
        # color), additive with the decode queue (48) and the embed
        # loop's ordered buffer (32) — the encoder only needs enough
        # depth to stay busy across the producer's device-wait gaps,
        # and 16 keeps the writer-side bound below the decode side's.
        self._writer = writer
        self._q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._exc: Optional[BaseException] = None
        self._closed = False
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                kind, payload = item
                if self._exc is not None:
                    # after a failure keep draining so producers/futures
                    # never deadlock on a full queue
                    if kind == self._ROLL:
                        payload.set_exception(self._exc)
                    continue
                if kind == self._ROLL:
                    try:
                        payload.set_result(self._writer.roll())
                    except BaseException as e:
                        self._exc = e
                        payload.set_exception(e)
                else:
                    try:
                        self._writer.write(payload)
                    except BaseException as e:
                        self._exc = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._exc is not None:
            # raise a fresh same-type copy chained to the stored
            # exception: repeated re-raises of one object would keep
            # appending frames onto its single traceback. copy.copy
            # (not type(exc)(*exc.args)) preserves the exact type AND
            # attributes (OSError.filename etc.) even for exception
            # classes whose constructors don't round-trip their args.
            import copy
            exc = self._exc
            try:
                new = copy.copy(exc)
                new.__traceback__ = None
            except Exception:
                new = RuntimeError(f"encoder thread failed: {exc!r}")
            raise new from exc

    def _check_open(self):
        if self._closed:
            # post-close writes would sit in the queue forever (the
            # encoder thread has exited) — fail loudly instead
            raise RuntimeError("AsyncEncoder used after close()")

    def write(self, frame_bgr: np.ndarray):
        self._check_open()
        self._check()
        self._q.put(("frame", frame_bgr))

    def sync_roll(self) -> int:
        """Drain queued frames, finalize the open segment, return total
        durable frames (SegmentedVideoWriter.roll contract)."""
        from concurrent.futures import Future
        self._check_open()
        self._check()
        fut: "Future[int]" = Future()
        self._q.put((self._ROLL, fut))
        return fut.result()

    def close(self):
        """Drain and stop the encoder thread (does NOT close the
        underlying writer — its context manager owns that). Idempotent;
        any later write/sync_roll raises."""
        if self._closed:
            return
        self._closed = True
        self._q.put(None)
        self._t.join()
        self._check()


class SegmentedVideoWriter:
    """Checkpointable writer: output accumulates as finalized segment files
    ``<base>.seg0000.mp4, ...`` so an interrupted run loses at most the
    segment in progress (an unreleased cv2 VideoWriter file has no moov
    atom and is unreadable — per-segment release is what makes resume
    possible at all). ``roll()`` finalizes the current segment;
    ``finalize()`` concatenates segments into the final path (ffmpeg
    stream-copy when available, deterministic re-encode otherwise) and
    removes them.
    """

    def __init__(self, path: str, fps: float, width: int, height: int,
                 fourcc: str = "mp4v", start_segment: int = 0,
                 frames_done: int = 0):
        self.path = path
        self.fps, self.width, self.height = fps, width, height
        self.fourcc = fourcc
        self.segment = start_segment
        self.frames_written = frames_done   # total across finalized segments
        self._seg_frames = 0
        self._writer: Optional[VideoWriter] = None
        # drop the partial segment a crashed run left at our start index AND
        # every higher-index segment from a stale earlier run (a rejected
        # checkpoint restarts at segment 0; a rerun producing fewer segments
        # would otherwise leave orphans that survive finalize())
        self._drop_segments_from(self.segment)

    def _drop_segments_from(self, start: int):
        for s in self.existing_segments(self.path):
            if int(s[-8:-4]) >= start:
                os.remove(s)

    def _seg_path(self, i: int) -> str:
        return f"{self.path}.seg{i:04d}.mp4"

    @staticmethod
    def existing_segments(path: str) -> List[str]:
        return sorted(glob.glob(f"{glob.escape(path)}.seg[0-9][0-9][0-9][0-9].mp4"))

    def write(self, frame_bgr: np.ndarray):
        if self._writer is None:
            self._writer = VideoWriter(self._seg_path(self.segment),
                                       self.fps, self.width, self.height,
                                       self.fourcc)
            self._seg_frames = 0
        self._writer.write(frame_bgr)
        self._seg_frames += 1

    def roll(self) -> int:
        """Finalize the open segment; returns total frames durably written."""
        if self._writer is not None:
            self._writer.close()
            self._writer = None
            self.frames_written += self._seg_frames
            self._seg_frames = 0
            self.segment += 1
        return self.frames_written

    def finalize(self):
        self.roll()
        self._drop_segments_from(self.segment)   # stale higher-index runs
        segs = [self._seg_path(i) for i in range(self.segment)]
        segs = [s for s in segs if os.path.exists(s)]
        if not _concat_copy(segs, self.path):
            # deterministic fallback: re-encode segment frames in order
            with VideoWriter(self.path, self.fps, self.width, self.height,
                             self.fourcc) as out:
                for s in segs:
                    with VideoReader(s) as r:
                        for frame in r:
                            out.write(frame)
        for s in segs:
            os.remove(s)

    def close(self):
        self.roll()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _concat_copy(segments: List[str], out_path: str,
                 timeout: float = 120.0) -> bool:
    """Lossless segment concatenation via ffmpeg's concat demuxer."""
    if not segments or not ffmpeg_available():
        return False
    lst = out_path + ".concat.txt"
    try:
        with open(lst, "w") as f:
            for s in segments:
                # concat-demuxer quoting: ' must become '\''
                esc = os.path.abspath(s).replace("'", "'\\''")
                f.write(f"file '{esc}'\n")
        res = subprocess.run(
            ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", lst,
             "-c", "copy", out_path],
            capture_output=True, timeout=timeout)
        return res.returncode == 0 and os.path.exists(out_path)
    except (subprocess.TimeoutExpired, Exception):
        return False
    finally:
        if os.path.exists(lst):
            os.remove(lst)


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
