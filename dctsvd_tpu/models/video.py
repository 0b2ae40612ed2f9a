"""Video watermark pipelines — streaming per-frame DCT–SVD on device.

Capabilities mirror the reference's three recovered video modules
(SURVEY.md §2.3; watermark/video_dct_svd.pyc, color_video_dct_svd.pyc,
color_video_dct_svd_with_audio.pyc):

  - grayscale video embed/extract (`embed_watermark_video`,
    `extract_watermark_video`; ref: video_dct_svd.pyc l.57-241)
  - blind statistical detect (`detect_watermark_video`; ref: l.244-315)
  - text watermarks (`embed_text_watermark_video`,
    `extract_text_watermark_video`; ref: l.318-513)
  - per-BGR-channel color variants (ref: color_video_dct_svd.pyc l.58-330)
  - audio-preserving variants via the ffmpeg contract
    (ref: color_video_dct_svd_with_audio.pyc l.58-179)

TPU-first structure: decode on host, every `frame_interval`-th frame is
dispatched to a jitted full-frame DCT+SVD embed graph (dispatch is async, so
device compute overlaps the host's decode of the next interval), and frames
write back in order. The watermark SVD happens once on device. Reference
behavioral quirks preserved deliberately: watermarked frames are re-encoded
grayscale-as-BGR in the gray pipeline (ref writes GRAY2BGR, l.148-151), the
mp4v codec is lossy so extraction averages over all marked frames, and video
embedding applies no kfrac truncation (ref: l.130-140 adds alpha*Sw over the
full spectrum).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dctsvd_tpu.io import meta as metaio
from dctsvd_tpu.io import video_io
from dctsvd_tpu.models import blocked as m_blocked
from dctsvd_tpu.models.text import create_text_watermark
from dctsvd_tpu.ops import dct, resize, svd
from dctsvd_tpu.utils.config import (ALPHA_VIDEO_DEFAULT,
                                     FRAME_INTERVAL_DEFAULT, K_FRAC_DEFAULT)
from dctsvd_tpu.utils.xfer import to_numpy

# cv2's gray conversions at the host boundary keep parity with the
# reference's BGR2GRAY float64 path; import guarded like io modules.
try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# Device graphs
# ---------------------------------------------------------------------------

@jax.jit
def _wm_svd(wm_gray: jax.Array):
    """One-time watermark factorization: svd(dct2(wm)) (ref: l.84-101)."""
    c = dct.dct2(wm_gray.astype(jnp.float32))
    return svd.svd_full(c)


@jax.jit
def _embed_frame_gray(gray: jax.Array, sw: jax.Array, alpha: jax.Array):
    """[..., H, W] gray frame(s): S' = S + alpha*Sw, rebuild, clip to u8.
    Returns (marked_u8, original S). No kfrac truncation (ref: l.130-140).
    Accepts u8 input — frames cross the host link 1 byte/px and widen to
    f32 on device (the reference's u8-gray -> float cast, same numerics)."""
    c = dct.dct2(gray.astype(jnp.float32))
    u, s, vt = svd.svd_full(c)
    s_marked = s + alpha * sw
    cw = jnp.einsum("...ij,...j,...jk->...ik", u, s_marked, vt,
                    precision=jax.lax.Precision.HIGHEST)
    marked = dct.idct2(cw)
    return jnp.clip(marked, 0, 255).astype(jnp.uint8), s


# [..., 3, H, W] channel-first color frames: the same grayscale watermark
# SVs embed into every channel (ref: color_video_dct_svd.pyc l.58-162),
# which is exactly _embed_frame_gray's broadcast over the leading axes —
# an alias, not a byte-identical copy paying its own trace/compile.
_embed_frame_color = _embed_frame_gray


@jax.jit
def _frame_singular_values(gray: jax.Array):
    return svd.svd_full(dct.dct2(gray.astype(jnp.float32)),
                        compute_uv=False)


# --- blocked-scheme graphs (scheme='blocked': the 8×8 throughput path
# wired into video per VideoMeta.scheme; same additive spread rule at
# block granularity, kfrac-truncated like the blocked image scheme) ------

@jax.jit
def _wm_svd_blocked(wm_gray: jax.Array):
    """One-time per-8×8-block watermark factorization (no permutation —
    the reference video path has no password layer)."""
    padded, _, _ = m_blocked._pad_to_blocks(wm_gray.astype(jnp.float32))
    coefs = dct.dct2_plane_blocks(padded)
    return svd.jacobi_svd(coefs, compute_uv=True)


@functools.partial(jax.jit, static_argnames=("kfrac",))
def _embed_frame_gray_blocked(gray: jax.Array, sw: jax.Array,
                              alpha: jax.Array,
                              kfrac: float = K_FRAC_DEFAULT):
    """[..., H, W] gray frame(s) through the fused blocked embed.
    Returns (marked_u8, per-block original S [..., N, 8]). u8-in."""
    marked, s = m_blocked._embed_planes(gray, sw, alpha, kfrac,
                                        out_u8=True)
    if marked.dtype == jnp.uint8:
        return marked, s
    return jnp.clip(marked, 0, 255).astype(jnp.uint8), s


@functools.partial(jax.jit, static_argnames=("kfrac",))
def _embed_frames_color_blocked(frames: jax.Array, sw: jax.Array,
                                alpha: jax.Array,
                                kfrac: float = K_FRAC_DEFAULT):
    """[..., H, W, 3] decode-layout u8 frames through the fused
    channels-last embed: no host moveaxis, no device moveaxis pass —
    the channel permute rides the rank-6 view transpose. Returns
    (marked u8 [..., H, W, 3], per-block original S [..., 3, N, 8])."""
    return m_blocked._embed_frames(frames, sw, alpha, kfrac)


@functools.partial(jax.jit, static_argnames=("kfrac", "h", "w", "sweeps",
                                             "channels_last"))
def _recover_wm_blocked(planes: jax.Array, s_orig: jax.Array,
                        uw: jax.Array, vwt: jax.Array, alpha: jax.Array,
                        kfrac: float, h: int, w: int,
                        sw: Optional[jax.Array] = None,
                        sweeps: Optional[int] = None,
                        channels_last: bool = False):
    """Blocked analog of _recover_wm: per-block ŝw = (S − S_orig)/α masked
    to the k embedded components, rank-restored through the watermark's
    block bases, inverse block-DCT. u8-in. ``sw`` shrinks each block's
    estimate toward the stored values with a deviation-based confidence
    so destroyed blocks collapse to the prior (m_blocked._shrink_sw_hat);
    ``sweeps`` replays the embed-time Jacobi schedule from the meta.
    ``channels_last``: planes is [..., H, W, C] decode-layout; the
    spectrum comes straight off it and the recovered estimate still
    lands channel-first [..., C, H, W] (the reconstruction is per-block,
    independent of the input layout)."""
    s_now = (m_blocked._frames_spectrum(planes, sweeps) if channels_last
             else m_blocked._plane_spectrum(planes, sweeps))
    k = m_blocked.k_of_block(kfrac)
    mask = jnp.arange(s_now.shape[-1]) < k
    # erasure flags unused here: the video path has no normalization tail
    # (the recovered estimate is consumed raw), so the clamp bound alone
    # is what the absent path needs
    sw_hat, _ = m_blocked._shrink_sw_hat((s_now - s_orig) / alpha, sw, k)
    sw_hat = jnp.where(mask, sw_hat, 0.0)
    blocks = jnp.einsum("...nij,...nj,...njk->...nik", uw, sw_hat, vwt,
                        precision=jax.lax.Precision.HIGHEST)
    hp, wp = h + (-h) % 8, w + (-w) % 8
    return dct.idct2_blocks_to_plane(blocks, hp, wp)[..., :h, :w]


@jax.jit
def _recover_wm(s_now: jax.Array, s_orig: jax.Array, uw: jax.Array,
                vtw: jax.Array, alpha: jax.Array):
    """Ŝw = (S − S_orig)/alpha; wm_est = idct2((Uw·Ŝw)·Vtw)
    (ref: l.206-229)."""
    sw_est = (s_now - s_orig) / alpha
    rec = jnp.einsum("ij,...j,jk->...ik", uw, sw_est, vtw,
                     precision=jax.lax.Precision.HIGHEST)
    return dct.idct2(rec)


@jax.jit
def _frame_stats(gray: jax.Array):
    """Per-frame singular-value statistics for blind video detection
    (ref: l.244-315): mean, std, max, entropy −Σ s·log(s+1e-10)."""
    s = svd.svd_full(dct.dct2(gray.astype(jnp.float32)), compute_uv=False)
    return (jnp.mean(s, axis=-1), jnp.std(s, axis=-1), jnp.max(s, axis=-1),
            -jnp.sum(s * jnp.log(s + 1e-10), axis=-1))


# ---------------------------------------------------------------------------
# Host pipelines
# ---------------------------------------------------------------------------

def _prepare_wm_plane(wm_path: Optional[str], text: Optional[str],
                      font_size: int, w: int, h: int) -> np.ndarray:
    if text is not None:
        return create_text_watermark(text, (w, h), font_size)
    if cv2 is None:
        raise RuntimeError("cv2 required")
    wm = cv2.imread(wm_path, cv2.IMREAD_GRAYSCALE)
    if wm is None:
        raise ValueError(f"Cannot open watermark: {wm_path}")
    return to_numpy(resize.resize_area_u8(jnp.asarray(wm), h, w))


def _embed_video_impl(host_path: str, out_path: str, meta_path: str,
                      wm_plane: np.ndarray, alpha: float,
                      frame_interval: int, color: bool,
                      progress_every: int = 100,
                      progress: Optional[Callable[[int, int], None]] = None,
                      temp_suffix: str = "", retries: int = 2,
                      checkpoint_every: int = 64, chunk: int = 4,
                      scheme: str = "full",
                      kfrac: Optional[float] = None,
                      resume: bool = False, segment_frames: int = 240):
    """Shared embed loop. Writes to out_path+temp_suffix (the with-audio
    variants remux afterwards).
    meta_path is normalized up front (np.savez appends '.npz' itself) so
    checkpoints, the resume loader and the returned path all agree.

    Marked frames batch into device dispatches of ``chunk`` (the streaming
    formulation of BASELINE config 4): frames buffer in arrival order, each
    full chunk runs ONE batched embed graph, and the buffer flushes to the
    writer strictly in order — device compute overlaps the host's decode of
    the next window (decode itself runs in a background thread,
    video_io.iter_frames_threaded). Partial final chunks pad by repetition
    (single compiled shape) and drop the padding on write-back.

    ``scheme='full'`` is the reference-parity whole-frame SVD
    (ref: video_dct_svd.pyc l.121-160); ``scheme='blocked'`` routes frames
    through the fused 8×8 throughput path (kfrac-truncated per block) and
    tags the meta so extraction dispatches on ``VideoMeta.scheme``.

    Failure handling (SURVEY.md §5): each device dispatch retries up to
    ``retries`` times (transient device/tunnel failures), and the meta
    checkpoints to ``meta_path`` every ``checkpoint_every`` marked frames.
    With ``resume=True`` the output is written as finalized segments of
    ``segment_frames`` frames (SegmentedVideoWriter) and the checkpoint
    records how many frames are durably on disk — a rerun with
    ``resume=True`` skips them, seeks the reader forward, and continues
    from the last finalized segment; the final output is the segment
    concatenation, byte-identical to an uninterrupted segmented run.
    """
    from dctsvd_tpu.utils.profiling import Throughput, logger

    if scheme == "blocked":
        kfrac = K_FRAC_DEFAULT if kfrac is None else kfrac
        uw_d, sw_d, vtw_d = _wm_svd_blocked(jnp.asarray(wm_plane))
    elif scheme == "full":
        kfrac = 1.0                       # ref video embeds the full spectrum
        uw_d, sw_d, vtw_d = _wm_svd(jnp.asarray(wm_plane))
    else:
        raise ValueError(f"unknown scheme: {scheme!r}")
    alpha_d = jnp.float32(alpha)

    # Materialize the watermark factors ONCE, up front. On tunnel-attached
    # chips a device->host transfer costs ~0.1-0.5 s AND holds the GIL for
    # ~3/4 of it (measured round 5, tools/probe_link.py) — re-downloading
    # uw/sw/vtw inside every _checkpoint stalled the decode/encode threads
    # for ~0.8 s per checkpoint on 1080p content.
    uw_np, sw_np, vtw_np = to_numpy(uw_d), to_numpy(sw_d), to_numpy(vtw_d)

    write_path = out_path + temp_suffix
    meta_path = metaio._npz_path(meta_path)
    host_sig = _host_signature(host_path)
    frame_indices = []
    s_list = []
    start_frame = 0
    start_segment = 0
    if resume:
        prev = _load_resume_state(meta_path, write_path, scheme, alpha,
                                  frame_interval, color, sw_np,
                                  kfrac, host_sig)
        if prev is not None:
            start_frame, start_segment, frame_indices, s_list = prev
            logger.info("resuming video embed at frame %d (segment %d, "
                        "%d marked frames already recorded)", start_frame,
                        start_segment, len(frame_indices))
    tp = Throughput(name="video-embed frames", log_every=0)

    sched_full, sched_xp = (m_blocked.embed_schedule_used()
                            if scheme == "blocked" else (0, 0))

    def _checkpoint(frames_done: int = -1, segments_done: int = 0):
        _materialize_s()
        meta = metaio.VideoMeta(
            frame_indices=np.asarray(frame_indices, np.int64),
            s_orig=np.stack(s_list) if s_list else
            np.zeros((0, 0), np.float32),
            uw=uw_np, sw=sw_np, vtw=vtw_np,
            alpha=alpha, frame_interval=frame_interval,
            watermark_shape=wm_plane.shape, is_color=color,
            scheme=scheme, kfrac=kfrac,
            frames_done=frames_done, segments_done=segments_done,
            sweeps=sched_full, sweeps_xpairs=sched_xp,
            host_sig=host_sig)
        metaio.save_video_meta(meta_path, meta)
        return meta

    # blocked color rides the channels-last path: frames stay [H, W, 3]
    # u8 end-to-end (no per-frame host moveaxis copies, and the device
    # channel permute is folded into the fused view transpose)
    hwc = color and scheme == "blocked"
    if scheme == "blocked":
        def _embed_fn(planes):
            if color:
                return _embed_frames_color_blocked(planes, sw_d, alpha_d,
                                                   kfrac=kfrac)
            return _embed_frame_gray_blocked(planes, sw_d, alpha_d,
                                             kfrac=kfrac)
    else:
        def _embed_fn(planes):
            fn = _embed_frame_color if color else _embed_frame_gray
            return fn(planes, sw_d, alpha_d)

    def _dispatch_batch(planes: np.ndarray):
        """planes: [K, H, W] gray, [K, 3, H, W] color (full scheme), or
        [K, H, W, 3] decode-layout u8 (blocked color). One device
        round trip for the whole chunk. Only TRANSIENT transport/device
        errors retry (remote-attachment hiccups, timeouts); programming
        errors (shape bugs, tracer leaks, OOM-by-construction) surface
        immediately instead of masquerading as device flakiness."""
        transient = (jax.errors.JaxRuntimeError, OSError, TimeoutError)
        last_err = None
        for _ in range(retries + 1):
            try:
                marked, s_orig = _embed_fn(jnp.asarray(planes))
                # marked frames must come back now (the writer needs
                # them in order), but s_orig stays ON DEVICE: its
                # download is deferred to checkpoint time
                # (_materialize_s) — on tunnel-attached chips every
                # device->host call holds the GIL for most of its
                # duration, so a per-chunk s download stalled the
                # decode/encode threads in the steady state.
                return to_numpy(marked), s_orig
            except transient as e:
                last_err = e
                logger.warning("chunk dispatch failed (%s), retrying", e)
        raise last_err

    # ordered buffer: ('pass', frame) | ('marked', slot); slots fill at flush
    buf = []
    pending = []           # (slot_id, frame_idx, plane)
    results = {}
    durable = {"frames": start_frame, "segments": start_segment,
               "since_roll": 0, "ckpt_marked": len(frame_indices)}

    # Device round trips run on a single worker thread: the host link
    # transfer (the dominant cost on tunnel-attached chips) overlaps the
    # main thread's encode and the reader thread's decode. One worker
    # keeps dispatch order = submission order, so results resolve FIFO.
    # (A 2-worker variant was measured: concurrent tunnel RPCs thrash —
    # 21.8 -> 8.8 fps end-to-end — so one worker it is.)
    import collections
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(max_workers=1)
    inflight = collections.deque()        # (future, [(slot, frame_idx)])

    def _submit():
        if not pending:
            return
        k = len(pending)
        planes = np.stack([p for _, _, p in pending] +
                          [pending[-1][2]] * (chunk - k))
        fut = pool.submit(_dispatch_batch, planes)
        inflight.append((fut, [(slot, fidx) for slot, fidx, _ in pending]))
        pending.clear()

    s_pending = collections.deque()       # (device s_orig [chunk,...], k)

    def _drain_one():
        fut, slots = inflight.popleft()
        marked, s_orig = fut.result()
        s_pending.append((s_orig, len(slots)))
        for j, (slot, fidx) in enumerate(slots):
            results[slot] = marked[j]
            frame_indices.append(fidx)
            tp.add()

    def _materialize_s():
        """Download the deferred per-chunk singular values (one warm-path
        transfer per chunk, off the steady-state loop). Runs before every
        checkpoint write so the meta on disk always carries s rows for
        every frame index it records. Transfers of already-computed
        arrays can still hit transient tunnel errors — same retry policy
        as the dispatch."""
        transient = (jax.errors.JaxRuntimeError, OSError, TimeoutError)
        while s_pending:
            dev, k = s_pending[0]
            last_err = None
            for _ in range(retries + 1):
                try:
                    arr = to_numpy(dev)
                    break
                except transient as e:
                    last_err = e
                    logger.warning("s download failed (%s), retrying", e)
            else:
                raise last_err
            s_list.extend(arr[:k])
            s_pending.popleft()

    def _write_one(writer, kind, payload):
        if kind == "pass":
            writer.write(payload)
        else:
            m = results.pop(payload)
            if hwc:
                writer.write(m)           # already decode-layout u8
            elif color:
                writer.write(np.ascontiguousarray(np.moveaxis(m, 0, -1)))
            else:
                writer.write(cv2.cvtColor(m, cv2.COLOR_GRAY2BGR))
        durable["since_roll"] += 1
        _maybe_roll(writer)

    def _pump(writer, wait: bool = False):
        """Write the longest prefix of the ordered buffer whose marked
        results are available; with wait=True, block until everything
        buffered so far is written. Segment rolls happen per frame, so
        segment boundaries depend only on the frame index — never on
        flush/drain timing — which keeps resumed runs byte-identical.

        Ready frames are written BEFORE the next future resolves: a failed
        dispatch must not abort frames that already computed — they roll
        into finalized segments the failed run can resume from."""
        while True:
            while buf:
                kind, payload = buf[0]
                if kind == "marked" and payload not in results:
                    break
                buf.pop(0)
                _write_one(writer, kind, payload)
            if (len(frame_indices) - durable["ckpt_marked"]
                    >= checkpoint_every):
                durable["ckpt_marked"] = len(frame_indices)
                _checkpoint(durable["frames"], durable["segments"])
            if wait and not inflight and pending and buf:
                # The head of buf is a marked slot whose chunk is still
                # filling and nothing is in flight: force the partial chunk
                # out, otherwise passthrough frames would keep accumulating
                # up to frame_interval x chunk frames (the buffer cap only
                # bounds RAM if hitting it guarantees progress).
                _submit()
            if not inflight or not (wait or inflight[0][0].done()):
                return
            _drain_one()

    def _maybe_roll(enc) -> bool:
        """Finalize the open segment once it reaches segment_frames.
        ``sync_roll`` drains the async-encode queue first, so every frame
        counted is durably encoded before the checkpoint records it."""
        if not (resume and durable["since_roll"] >= segment_frames):
            return False
        frames_done = enc.sync_roll()
        segs = raw_writer["w"].segment
        durable.update(frames=frames_done, segments=segs, since_roll=0)
        _checkpoint(frames_done, segs)
        return True

    raw_writer = {}

    slot_counter = 0
    try:
        with video_io.VideoReader(host_path) as reader:
            if resume:
                writer_cm = video_io.SegmentedVideoWriter(
                    write_path, reader.fps, reader.width, reader.height,
                    start_segment=start_segment, frames_done=start_frame)
            else:
                writer_cm = video_io.VideoWriter(write_path, reader.fps,
                                                 reader.width, reader.height)
            with writer_cm as writer:
                raw_writer["w"] = writer
                # encode runs on its own thread: mp4 encoding overlaps the
                # host-link wait instead of serializing against it
                # (VERDICT r2 #3); FIFO order keeps segment boundaries
                # byte-identical to the synchronous writer
                enc = video_io.AsyncEncoder(writer)
                # Passthrough frames drain straight to the writer whenever no
                # marked frame is awaiting its device result ahead of them;
                # otherwise the buffer cap makes _pump(wait=True) guarantee
                # progress — dispatching the partial chunk if that is what
                # blocks the head — so host RAM between flushes is bounded by
                # max_buffered frames even at large frame_interval × 4K.
                # Cap must cover a full dispatch span (chunk × interval
                # frames arrive between submits) or the main thread hits
                # the cap mid-flight and serializes on the link round
                # trip; RAM cost is max_buffered decoded frames.
                max_buffered = int(os.environ.get(
                    "DCTSVD_VIDEO_MAX_BUFFERED", "32"))
                try:
                    for idx, frame in video_io.iter_frames_threaded(
                            reader, start_frame=start_frame):
                        if idx % frame_interval == 0:
                            # u8 planes: the device cast is free, the host
                            # link (tunnel-attached chips: ~20 MB/s) moves
                            # 1 byte/px
                            if hwc:
                                plane = frame
                            elif color:
                                plane = np.moveaxis(frame, -1, 0)
                            else:
                                plane = cv2.cvtColor(frame,
                                                     cv2.COLOR_BGR2GRAY)
                            buf.append(("marked", slot_counter))
                            pending.append((slot_counter, idx, plane))
                            slot_counter += 1
                            if len(pending) >= chunk:
                                _submit()      # async: don't block writes
                                # same backpressure as the passthrough
                                # branch: at frame_interval=1 EVERY frame
                                # lands here, and without the wait the
                                # buffer + executor queue grow by the
                                # decode/device rate delta until OOM
                                _pump(enc, wait=len(buf) >= max_buffered)
                        elif pending or buf:
                            buf.append(("pass", frame))
                            _pump(enc, wait=len(buf) >= max_buffered)
                        else:
                            _write_one(enc, "pass", frame)
                        if progress and idx % progress_every == 0:
                            progress(idx, reader.total_frames)
                    _submit()
                    _pump(enc, wait=True)
                except BaseException:
                    # drain the encode queue BEFORE the writer closes so
                    # already-computed frames land in finalized segments a
                    # rerun can resume from — but never mask the in-flight
                    # exception with an encoder one
                    try:
                        enc.close()
                    except BaseException:
                        pass
                    raise
                else:
                    enc.close()
                if resume:
                    writer.finalize()
    finally:
        pool.shutdown(wait=True)

    meta = _checkpoint()
    return write_path, meta_path, meta


def _host_signature(host_path: str) -> str:
    """Cheap host-file identity for resume binding: basename, byte size and
    mtime. Not content-hashed (a 4K clip can be GBs), but enough to catch
    the realistic accidents — resuming against a different file at the same
    path or the same name re-rendered."""
    try:
        st = os.stat(host_path)
        return (f"{os.path.basename(host_path)}:{st.st_size}"
                f":{int(st.st_mtime)}")
    except OSError:
        return ""


def _load_resume_state(meta_path: str, write_path: str, scheme: str,
                       alpha: float, frame_interval: int, color: bool,
                       sw_now: np.ndarray, kfrac: float, host_sig: str):
    """Validate a checkpoint meta + finalized segments for resume; returns
    (start_frame, start_segment, frame_indices, s_list) or None (fresh
    start). The checkpoint's durable frame count is trusted only when every
    finalized segment it references still exists, and the checkpointed
    watermark singular values must match the CURRENT watermark's (``sw_now``)
    — otherwise a rerun with a different watermark (or a different
    same-sized host producing a different resize) would silently splice
    segments carrying the old mark. ``kfrac`` and the host signature bind
    the remaining embed parameters: a rerun with a different truncation, or
    against a different host file, must restart."""
    if not os.path.exists(meta_path):
        return None
    try:
        prev = metaio.load_video_meta(meta_path)
    except Exception:
        return None
    if (prev.frames_done <= 0 or prev.scheme != scheme
            or prev.is_color != color
            or abs(prev.alpha - alpha) > 1e-12
            or abs(prev.kfrac - kfrac) > 1e-12
            or prev.frame_interval != frame_interval):
        return None
    # The Jacobi sweep schedule is an embed parameter like alpha/kfrac:
    # splicing segments embedded under different schedules would leave the
    # final meta recording only the LAST run's count, so extraction's
    # schedule replay (s_cw − sc cancellation) silently breaks for the
    # earlier frames. A rerun under a different DCTSVD_FUSED_SWEEPS — or
    # on a different backend (fused vs XLA) — must restart.
    sched_now = (m_blocked.embed_schedule_used() if scheme == "blocked"
                 else (0, 0))
    if (prev.sweeps, prev.sweeps_xpairs) != sched_now:
        return None
    # pre-round-3 checkpoints carry no host_sig ("") and stay resumable;
    # any recorded signature must match the current host file exactly
    if prev.host_sig and prev.host_sig != host_sig:
        return None
    sw_prev = np.asarray(prev.sw)
    if (sw_prev.shape != sw_now.shape
            or not np.allclose(sw_prev, sw_now, rtol=1e-5, atol=1e-3)):
        return None
    segs = video_io.SegmentedVideoWriter.existing_segments(write_path)
    have = {os.path.basename(s) for s in segs}
    need = {f"{os.path.basename(write_path)}.seg{i:04d}.mp4"
            for i in range(prev.segments_done)}
    if not need.issubset(have):
        return None
    keep = prev.frame_indices < prev.frames_done
    return (int(prev.frames_done), int(prev.segments_done),
            list(prev.frame_indices[keep]),
            [np.asarray(s) for s in prev.s_orig[keep]])


def embed_watermark_video(host_path: str, wm_path: str, out_path: str,
                          meta_path: str,
                          alpha: float = ALPHA_VIDEO_DEFAULT,
                          frame_interval: int = FRAME_INTERVAL_DEFAULT,
                          progress: Optional[Callable] = None,
                          scheme: str = "full",
                          resume: bool = False):
    """Grayscale video embed (ref: video_dct_svd.pyc l.57-167).
    ``scheme='blocked'`` uses the fused 8×8 throughput path;
    ``resume=True`` writes checkpointable segments and continues an
    interrupted run from the last finalized segment."""
    info = video_io.get_video_info(host_path)
    wm = _prepare_wm_plane(wm_path, None, 0, info["width"], info["height"])
    _, meta_p, _ = _embed_video_impl(host_path, out_path, meta_path, wm,
                                     alpha, frame_interval, color=False,
                                     progress=progress, scheme=scheme,
                                     resume=resume)
    return out_path, meta_p


def embed_text_watermark_video(host_path: str, text: str, out_path: str,
                               meta_path: str,
                               alpha: float = ALPHA_VIDEO_DEFAULT,
                               font_size: int = 40,
                               frame_interval: int = FRAME_INTERVAL_DEFAULT,
                               progress: Optional[Callable] = None,
                               scheme: str = "full", resume: bool = False):
    """Text watermark variant (ref: l.318-430); text round-trips through
    the meta, not the pixels (ref: l.433-513)."""
    info = video_io.get_video_info(host_path)
    wm = create_text_watermark(text, (info["width"], info["height"]),
                               font_size)
    _, meta_p, meta = _embed_video_impl(host_path, out_path, meta_path, wm,
                                        alpha, frame_interval, color=False,
                                        progress=progress, scheme=scheme,
                                        resume=resume)
    meta.is_text = True
    meta.text = text
    meta.font_size = font_size
    metaio.save_video_meta(meta_p, meta)
    return out_path, meta_p


def embed_watermark_video_color(host_path: str, wm_path: str, out_path: str,
                                meta_path: str,
                                alpha: float = ALPHA_VIDEO_DEFAULT,
                                frame_interval: int = FRAME_INTERVAL_DEFAULT,
                                progress: Optional[Callable] = None,
                                scheme: str = "full", resume: bool = False):
    """Color (per-BGR-channel) embed (ref: color_video_dct_svd.pyc
    l.58-162)."""
    info = video_io.get_video_info(host_path)
    wm = _prepare_wm_plane(wm_path, None, 0, info["width"], info["height"])
    _, meta_p, _ = _embed_video_impl(host_path, out_path, meta_path, wm,
                                     alpha, frame_interval, color=True,
                                     progress=progress, scheme=scheme,
                                     resume=resume)
    return out_path, meta_p


def embed_text_watermark_video_color(host_path: str, text: str,
                                     out_path: str, meta_path: str,
                                     alpha: float = ALPHA_VIDEO_DEFAULT,
                                     font_size: int = 40,
                                     frame_interval: int =
                                     FRAME_INTERVAL_DEFAULT,
                                     progress: Optional[Callable] = None,
                                     scheme: str = "full",
                                     resume: bool = False):
    """(ref: color_video_dct_svd.pyc l.165-269)."""
    info = video_io.get_video_info(host_path)
    wm = create_text_watermark(text, (info["width"], info["height"]),
                               font_size)
    _, meta_p, meta = _embed_video_impl(host_path, out_path, meta_path, wm,
                                        alpha, frame_interval, color=True,
                                        progress=progress, scheme=scheme,
                                        resume=resume)
    meta.is_text = True
    meta.text = text
    meta.font_size = font_size
    metaio.save_video_meta(meta_p, meta)
    return out_path, meta_p


def embed_watermark_video_color_with_audio(host_path: str, wm_path: str,
                                           out_path: str, meta_path: str,
                                           alpha: float =
                                           ALPHA_VIDEO_DEFAULT,
                                           frame_interval: int =
                                           FRAME_INTERVAL_DEFAULT,
                                           scheme: str = "full",
                                           resume: bool = False):
    """Color embed + ffmpeg audio remux with graceful fallback
    (ref: color_video_dct_svd_with_audio.pyc l.58-179)."""
    info = video_io.get_video_info(host_path)
    wm = _prepare_wm_plane(wm_path, None, 0, info["width"], info["height"])
    temp, meta_p, _ = _embed_video_impl(host_path, out_path, meta_path, wm,
                                        alpha, frame_interval, color=True,
                                        temp_suffix=".temp.mp4",
                                        scheme=scheme, resume=resume)
    had_audio = video_io.finalize_with_audio(temp, host_path, out_path,
                                             want_audio=True)
    return out_path, meta_p, had_audio


def embed_text_watermark_video_color_with_audio(host_path: str, text: str,
                                                out_path: str,
                                                meta_path: str,
                                                alpha: float =
                                                ALPHA_VIDEO_DEFAULT,
                                                font_size: int = 40,
                                                frame_interval: int =
                                                FRAME_INTERVAL_DEFAULT,
                                                scheme: str = "full",
                                                resume: bool = False):
    """(ref: color_video_dct_svd_with_audio.pyc l.182-~300)."""
    info = video_io.get_video_info(host_path)
    wm = create_text_watermark(text, (info["width"], info["height"]),
                               font_size)
    temp, meta_p, meta = _embed_video_impl(host_path, out_path, meta_path,
                                           wm, alpha, frame_interval,
                                           color=True,
                                           temp_suffix=".temp.mp4",
                                           scheme=scheme, resume=resume)
    meta.is_text = True
    meta.text = text
    meta.font_size = font_size
    metaio.save_video_meta(meta_p, meta)
    had_audio = video_io.finalize_with_audio(temp, host_path, out_path,
                                             want_audio=True)
    return out_path, meta_p, had_audio


def extract_watermark_video(video_path: str, meta_path: str,
                            out_path: str, chunk: int = 4) -> str:
    """Average per-frame watermark estimates over all recorded frames
    (ref: video_dct_svd.pyc l.170-241; color: color_video_dct_svd.pyc
    l.272-330 additionally averages the three channels). Marked frames
    batch into device dispatches of ``chunk``; decode (seek+read) runs in
    a producer thread overlapping device work, the cross-frame sum
    ACCUMULATES ON DEVICE, and only the final averaged plane is read back
    (per-chunk readbacks were ~8 MB each over the host link)."""
    import queue
    import threading

    meta = metaio.load_video_meta(meta_path)
    alpha_d = jnp.float32(max(meta.alpha, 1e-8))
    uw_d = jnp.asarray(meta.uw)
    vtw_d = jnp.asarray(meta.vtw)
    sw_d = jnp.asarray(meta.sw)
    h, w = meta.watermark_shape[:2]
    blocked_scheme = meta.scheme == "blocked"
    hwc_x = blocked_scheme and meta.is_color   # channels-last device path

    acc_d = None
    count = 0
    planes_buf = []
    sorig_buf = []

    def _flush():
        nonlocal acc_d, count
        if not planes_buf:
            return
        k = len(planes_buf)
        pad = chunk - k
        planes = np.stack(planes_buf + [planes_buf[-1]] * pad)
        sorig = np.stack(sorig_buf + [sorig_buf[-1]] * pad)
        if blocked_scheme:
            est = _recover_wm_blocked(jnp.asarray(planes),
                                      jnp.asarray(sorig), uw_d, vtw_d,
                                      alpha_d, meta.kfrac, h, w, sw=sw_d,
                                      sweeps=meta.sched(),
                                      channels_last=hwc_x)
        else:
            s_now = _frame_singular_values(jnp.asarray(planes))
            est = _recover_wm(s_now, jnp.asarray(sorig), uw_d, vtw_d,
                              alpha_d)
        if meta.is_color:
            est = jnp.mean(est, axis=-3)             # [K, H, W]
        est_sum = jnp.sum(est[:k, :h, :w], axis=0)   # device-resident
        acc_d = est_sum if acc_d is None else acc_d + est_sum
        count += k
        planes_buf.clear()
        sorig_buf.clear()

    # producer: random-access decode on its own thread (it owns the
    # capture; cv2.VideoCapture is not shared across threads)
    q: "queue.Queue" = queue.Queue(maxsize=max(2 * chunk, 8))
    _DONE = object()

    def _producer():
        try:
            with video_io.VideoReader(video_path) as reader:
                for i, idx in enumerate(meta.frame_indices):
                    frame = reader.seek_read(int(idx))
                    if frame is None:
                        continue
                    q.put((i, frame))
            q.put(_DONE)
        except BaseException as e:
            q.put(e)

    t = threading.Thread(target=_producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _DONE:
            break
        if isinstance(item, BaseException):
            raise item
        i, frame = item
        if hwc_x:
            planes_buf.append(frame)      # decode layout, no host copy
        elif meta.is_color:
            planes_buf.append(np.moveaxis(frame, -1, 0))
        else:
            planes_buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
        sorig_buf.append(np.asarray(meta.s_orig[i]))
        if len(planes_buf) >= chunk:
            _flush()
    t.join()
    _flush()
    if acc_d is None:
        raise ValueError("No recorded frames could be read from the video.")
    wm = np.clip(np.asarray(acc_d) / count, 0, 255).astype(np.uint8)
    if cv2 is not None:
        cv2.imwrite(out_path, wm)
    else:  # pragma: no cover
        from PIL import Image
        Image.fromarray(wm, "L").save(out_path)
    return out_path


def extract_text_watermark_video(video_path: str, meta_path: str,
                                 out_path: str) -> Optional[str]:
    """Same math; returns the embedded text recovered from the meta
    (ref: l.433-513 — the text round-trips through metadata)."""
    extract_watermark_video(video_path, meta_path, out_path)
    meta = metaio.load_video_meta(meta_path)
    return meta.text


def detect_watermark_video(video_path: str,
                           frame_sample_rate: int = 30,
                           chunk: int = 8) -> Dict:
    """Blind statistical heuristic over sampled frames
    (ref: video_dct_svd.pyc l.244-315). Frames batch on device in chunks —
    one values-only SVD dispatch per `chunk` sampled frames."""
    try:
        stats = {"means": [], "stds": [], "maxes": [], "entropies": []}
        sampled = 0
        buf = []

        def flush():
            nonlocal sampled
            if not buf:
                return
            batch = jnp.asarray(np.stack(buf))   # u8 upload
            m, s, mx, e = (np.asarray(v) for v in _frame_stats(batch))
            stats["means"].extend(m.tolist())
            stats["stds"].extend(s.tolist())
            stats["maxes"].extend(mx.tolist())
            stats["entropies"].extend(e.tolist())
            sampled += len(buf)
            buf.clear()

        with video_io.VideoReader(video_path) as reader:
            for idx, frame in enumerate(reader):
                if idx % frame_sample_rate == 0:
                    buf.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
                    if len(buf) >= chunk:
                        flush()
            flush()

        if sampled == 0:
            return {"error": "no frames analyzed"}
        mean_std = float(np.std(stats["means"]))
        std_std = float(np.std(stats["stds"]))
        likelihood = 1.0 / (1.0 + mean_std + std_std)
        return {
            "total_frames_analyzed": sampled,
            "watermark_likelihood": likelihood,
            "frame_statistics": stats,
            "mean_consistency": mean_std,
            "std_consistency": std_std,
        }
    except Exception as e:  # ref returns {'error': ...} on failure
        return {"error": str(e)}


get_video_info = video_io.get_video_info
