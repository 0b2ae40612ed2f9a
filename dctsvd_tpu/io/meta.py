"""The `.npz` meta side-channel — the persistence contract.

Non-blind extraction/detection needs side information saved at embed time;
the reference stores it as a compressed `.npz` next to the stego PNG
(schema in SURVEY.md §2.5; ref: app_dct_svd_single.py:157-166,183-189).
This module reads/writes that schema byte-compatibly (same keys, dtypes and
HMAC coverage order) and adds the blocked-path scheme under its own
``mode`` tag, plus the legacy pickled video metas (ref:
watermark/video_dct_svd.pyc l.167,191).

HMAC digest coverage (fixed order, raw array bytes):
  gray:  Sc, Uw, Vwt                        (ref: app_dct_svd_single.py:182)
  color: Sb,Sg,Sr, UWb,UWg,UWr, VWbt,VWgt,VWrt   (ref: :152-156)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from dctsvd_tpu.utils import crypto

# Jacobi pairs per full 8x8 cyclic sweep = C(8,2). Duplicated here (not
# imported from ops.wm_pallas, which pulls the Pallas stack into the IO
# layer); pinned equal to len(wm_pallas.PAIRS) by tests/test_meta.py.
_PAIRS_PER_SWEEP = 28


def _sched_join(full: int, xpairs: int):
    """(full sweeps, extra pairs) -> in-process sweep value; int when
    integral so legacy call paths/jit keys are unchanged (mirror of
    ops/wm_pallas.sched_join)."""
    full, xpairs = int(full), int(xpairs)
    full += xpairs // _PAIRS_PER_SWEEP
    xpairs %= _PAIRS_PER_SWEEP
    return full if xpairs == 0 else full + xpairs / _PAIRS_PER_SWEEP


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' to any path not already ending in it, so a
    caller passing 'img.meta' would get 'img.meta.npz' on disk while every
    save function returned (and the API surfaced) the nonexistent original
    path. Normalize once here; savers return the REAL path and loaders
    accept either spelling."""
    return path if path.endswith(".npz") else path + ".npz"


def _load_path(path: str) -> str:
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        return path + ".npz"
    return path


MODE_GRAY = "gray"
MODE_COLOR = "color"
MODE_BLOCKED_GRAY = "blocked-gray"
MODE_BLOCKED_COLOR = "blocked-color"


def gray_digest(key: bytes, sc: np.ndarray, uw: np.ndarray,
                vwt: np.ndarray) -> bytes:
    return crypto.meta_digest(key, [sc.tobytes(), uw.tobytes(), vwt.tobytes()])


def color_digest(key: bytes, s_bgr: np.ndarray, uw: np.ndarray,
                 vwt: np.ndarray) -> bytes:
    """s_bgr/uw/vwt stacked [3, ...] in B,G,R order."""
    parts = [s_bgr[0].tobytes(), s_bgr[1].tobytes(), s_bgr[2].tobytes(),
             uw[0].tobytes(), uw[1].tobytes(), uw[2].tobytes(),
             vwt[0].tobytes(), vwt[1].tobytes(), vwt[2].tobytes()]
    return crypto.meta_digest(key, parts)


def save_gray_meta(path: str, *, sc, uw, vwt, sw, shape, alpha: float,
                   kfrac: float, nonce: Optional[bytes],
                   digest: Optional[bytes],
                   payload_type: str = "image",
                   extra: Optional[Dict] = None) -> str:
    """nonce/digest None = password-less "open" mode (the legacy core's
    behavior — its metas carry no nonce/digest keys,
    ref: dct_svd_core_secure.py:128-129)."""
    kw = dict(mode=MODE_GRAY, payload_type=payload_type,
              Sc=sc, Uw=uw, Vwt=vwt, Sw=sw,
              shape=np.asarray(shape), alpha=float(alpha),
              kfrac=float(kfrac))
    if nonce is not None:
        kw["nonce"] = np.frombuffer(nonce, dtype=np.uint8)
    if digest is not None:
        kw["digest"] = np.frombuffer(digest, dtype=np.uint8)
    if extra:
        kw.update(extra)
    path = _npz_path(path)
    np.savez_compressed(path, **kw)
    return path


def save_color_meta(path: str, *, s_bgr, uw, vwt, sw, shape, alpha: float,
                    kfrac: float, nonce: Optional[bytes],
                    digest: Optional[bytes],
                    payload_type: str = "image",
                    extra: Optional[Dict] = None) -> str:
    """s_bgr/uw/vwt/sw stacked [3, ...] in B,G,R channel order;
    nonce/digest None = password-less "open" mode (see save_gray_meta)."""
    kw = dict(mode=MODE_COLOR, payload_type=payload_type,
              Sb=s_bgr[0], Sg=s_bgr[1], Sr=s_bgr[2],
              UWb=uw[0], VWbt=vwt[0], SWb=sw[0],
              UWg=uw[1], VWgt=vwt[1], SWg=sw[1],
              UWr=uw[2], VWrt=vwt[2], SWr=sw[2],
              shape=np.asarray(shape), alpha=float(alpha),
              kfrac=float(kfrac))
    if nonce is not None:
        kw["nonce"] = np.frombuffer(nonce, dtype=np.uint8)
    if digest is not None:
        kw["digest"] = np.frombuffer(digest, dtype=np.uint8)
    if extra:
        kw.update(extra)
    path = _npz_path(path)
    np.savez_compressed(path, **kw)
    return path


@dataclass
class Meta:
    """A loaded meta file, normalized across gray/color/blocked modes."""
    mode: str
    payload_type: str
    alpha: float
    kfrac: float
    shape: tuple
    nonce: Optional[bytes]
    digest: Optional[bytes]
    arrays: Dict[str, np.ndarray] = field(default_factory=dict)
    sweeps: int = 0   # embed-time Jacobi sweep schedule (blocked modes;
                      # 0 = "converged or unknown") — replayed at
                      # extract/detect. Metas written by pre-round-3
                      # builds carry no sweeps key and load as 0; if such
                      # a meta was fused-embedded (old serving default 3)
                      # the replay runs the near-converged kernel default
                      # instead, leaving a small un-cancelled residual —
                      # documented legacy degradation, re-embed to clear.
    digest_v: int = 1  # blocked-meta digest schema (models/blocked.py
                       # DIGEST_V); 1 = legacy Sc/Uw/Vwt-only coverage
                       # (metas without a digest_v key)
    sweeps_xpairs: int = 0   # extra Jacobi pairs past `sweeps` full
                             # sweeps (0..27): fractional tiers serialize
                             # as TWO integers so embed and extract replay
                             # a byte-identical rotation prefix (never a
                             # float a reader could re-round differently)

    def sched(self):
        """The embed-time sweep schedule as the in-process value the
        kernel layer takes: int for integral schedules (0 = converged/
        XLA), else full + xpairs/28 on the exact pair grid
        (ops/wm_pallas.sched_join)."""
        return _sched_join(self.sweeps, self.sweeps_xpairs)

    @property
    def is_color(self) -> bool:
        return self.mode in (MODE_COLOR, MODE_BLOCKED_COLOR)

    @property
    def is_blocked(self) -> bool:
        return self.mode.startswith("blocked")

    def s_cover_stacked(self) -> np.ndarray:
        """[3, L] B,G,R for color modes, [L] for gray."""
        if self.is_color:
            return np.stack([self.arrays["Sb"], self.arrays["Sg"],
                             self.arrays["Sr"]])
        return self.arrays["Sc"]

    def wm_basis_stacked(self):
        """(uw, vwt, sw), stacked [3, ...] for color, plain for gray."""
        if self.is_color:
            uw = np.stack([self.arrays["UWb"], self.arrays["UWg"],
                           self.arrays["UWr"]])
            vwt = np.stack([self.arrays["VWbt"], self.arrays["VWgt"],
                            self.arrays["VWrt"]])
            sw = np.stack([self.arrays["SWb"], self.arrays["SWg"],
                           self.arrays["SWr"]])
            return uw, vwt, sw
        return self.arrays["Uw"], self.arrays["Vwt"], self.arrays["Sw"]


# Only the keys load_meta actually consumes into Meta fields: anything
# else (including caller ``extra`` entries that happen to be named like
# video-meta scalars, e.g. 'text'/'font_size') stays visible in
# Meta.arrays instead of silently vanishing on a save->load round trip.
_SCALARS = {"mode", "payload_type", "alpha", "kfrac", "shape", "nonce",
            "digest", "sweeps", "sweeps_xpairs", "digest_v"}


def load_meta(path: str) -> Meta:
    """Load any image-mode meta (ours or reference-written)."""
    with np.load(_load_path(path), allow_pickle=False) as data:
        keys = set(data.files)
        mode = str(data["mode"]) if "mode" in keys else MODE_GRAY
        payload_type = (str(data["payload_type"])
                        if "payload_type" in keys else "image")
        alpha = float(data["alpha"])
        kfrac = float(data["kfrac"]) if "kfrac" in keys else 0.6
        shape = tuple(int(v) for v in data["shape"]) if "shape" in keys else ()
        nonce = (bytes(data["nonce"].astype(np.uint8).tobytes())
                 if "nonce" in keys else None)
        digest = (bytes(data["digest"].astype(np.uint8).tobytes())
                  if "digest" in keys else None)
        sweeps = int(data["sweeps"]) if "sweeps" in keys else 0
        xpairs = (int(data["sweeps_xpairs"])
                  if "sweeps_xpairs" in keys else 0)
        digest_v = int(data["digest_v"]) if "digest_v" in keys else 1
        arrays = {k: np.asarray(data[k]) for k in keys if k not in _SCALARS}
    return Meta(mode=mode, payload_type=payload_type, alpha=alpha,
                kfrac=kfrac, shape=shape, nonce=nonce, digest=digest,
                arrays=arrays, sweeps=sweeps, sweeps_xpairs=xpairs,
                digest_v=digest_v)


def default_stego_path(out_path: str) -> str:
    """Non-.png stego paths are rewritten to `<base>_stego.png`
    (ref: app_dct_svd_single.py:148-149,178-179)."""
    if not out_path.lower().endswith(".png"):
        return os.path.splitext(out_path)[0] + "_stego.png"
    return out_path


def default_wm_path(out_path: str) -> str:
    """Non-.png extract outputs become `<base>_wm.png`
    (ref: app_dct_svd_single.py:225-226,278-279)."""
    if not out_path.lower().endswith(".png"):
        return os.path.splitext(out_path)[0] + "_wm.png"
    return out_path


# ---------------------------------------------------------------------------
# Video metas
# ---------------------------------------------------------------------------

@dataclass
class VideoMeta:
    """Normalized video meta (ours or legacy reference-pickled format).

    Reference format (ref: video_dct_svd.pyc l.167): uncompressed np.savez
    with `watermark_frames` (list of ints), `original_singular_values`
    (list of [L] arrays for gray, list of {'B','G','R'} dicts for color —
    a pickled object array needing allow_pickle=True), `Uw, Sw, Vtw, alpha,
    frame_interval, watermark_shape`, optional `text, font_size,
    is_text_watermark, is_color`. Our writer keeps the same keys but stores
    `original_singular_values` as a stacked [F, L] / [F, 3, L] float array —
    no pickle — and the loader accepts both layouts.
    """
    frame_indices: np.ndarray        # [F] int
    s_orig: np.ndarray               # [F, L] gray / [F, 3, L] color (B,G,R)
    uw: np.ndarray                   # [H, L]
    sw: np.ndarray                   # [L]
    vtw: np.ndarray                  # [L, W]
    alpha: float
    frame_interval: int
    watermark_shape: tuple
    is_color: bool = False
    is_text: bool = False
    text: Optional[str] = None
    font_size: Optional[int] = None
    scheme: str = "full"             # 'full' (reference-parity) | 'blocked'
    kfrac: float = 1.0               # per-block truncation (blocked scheme;
                                     # 1.0 = full spectrum, the ref behavior)
    frames_done: int = -1            # resume checkpoint: total frames flushed
                                     # into finalized output segments
                                     # (-1 = embed completed, no resume state)
    segments_done: int = 0           # finalized segment count at checkpoint
    sweeps: int = 0                  # embed-time Jacobi sweep schedule
                                     # (blocked scheme; 0 = converged/XLA)
    sweeps_xpairs: int = 0           # extra pairs past `sweeps` full
                                     # sweeps (fractional tiers; see Meta)
    host_sig: str = ""               # host video identity at checkpoint time
                                     # (basename:size:mtime) — binds a resume
                                     # checkpoint to the host file it started
                                     # from

    def sched(self):
        """Embed-time sweep schedule as the in-process value (see
        Meta.sched)."""
        return _sched_join(self.sweeps, self.sweeps_xpairs)


def save_video_meta(path: str, m: VideoMeta) -> str:
    kw = dict(watermark_frames=np.asarray(m.frame_indices, np.int64),
              original_singular_values=np.asarray(m.s_orig),
              Uw=m.uw, Sw=m.sw, Vtw=m.vtw, alpha=float(m.alpha),
              frame_interval=int(m.frame_interval),
              watermark_shape=np.asarray(m.watermark_shape),
              is_color=bool(m.is_color),
              is_text_watermark=bool(m.is_text),
              scheme=m.scheme, kfrac=float(m.kfrac),
              frames_done=int(m.frames_done),
              segments_done=int(m.segments_done),
              sweeps=int(m.sweeps),
              sweeps_xpairs=int(m.sweeps_xpairs),
              host_sig=m.host_sig)
    if m.text is not None:
        kw["text"] = m.text
        kw["font_size"] = int(m.font_size or 40)
    path = _npz_path(path)
    np.savez(path, **kw)
    return path


def load_video_meta(path: str) -> VideoMeta:
    # Our own writer is pickle-free; only legacy reference-written metas
    # store pickled object arrays. Try the safe load first (reading every
    # array — npz members load lazily, so the object-array ValueError only
    # fires at access time) and fall back to allow_pickle=True ONLY on that
    # error. A meta from an untrusted source therefore cannot execute
    # arbitrary code unless it genuinely is the legacy pickled format
    # (documented trust assumption: legacy metas need a trusted source).
    path = _load_path(path)
    legacy = False
    with np.load(path, allow_pickle=False) as npz:
        try:
            data = {k: npz[k] for k in npz.files}
        except ValueError:
            legacy = True
    if legacy:
        with np.load(path, allow_pickle=True) as npz:
            data = {k: npz[k] for k in npz.files}
    keys = set(data.keys())
    sv = data["original_singular_values"]
    is_color = bool(data["is_color"]) if "is_color" in keys else False
    if sv.dtype == object:
        # legacy pickled list: [L] arrays (gray) or {'B','G','R'} dicts
        rows = list(sv)
        if rows and isinstance(rows[0], dict):
            s_orig = np.stack([np.stack([r["B"], r["G"], r["R"]])
                               for r in rows])
            is_color = True
        else:
            s_orig = np.stack(rows)
    else:
        s_orig = np.asarray(sv)
    text = str(data["text"]) if "text" in keys else None
    return VideoMeta(
        frame_indices=np.asarray(data["watermark_frames"], np.int64),
        s_orig=s_orig,
        uw=np.asarray(data["Uw"]), sw=np.asarray(data["Sw"]),
        vtw=np.asarray(data["Vtw"]),
        alpha=float(data["alpha"]),
        frame_interval=int(data["frame_interval"]),
        watermark_shape=tuple(int(v) for v in data["watermark_shape"]),
        is_color=is_color,
        is_text=bool(data["is_text_watermark"])
        if "is_text_watermark" in keys else False,
        text=text,
        font_size=int(data["font_size"]) if "font_size" in keys else None,
        scheme=str(data["scheme"]) if "scheme" in keys else "full",
        kfrac=float(data["kfrac"]) if "kfrac" in keys else 1.0,
        frames_done=int(data["frames_done"]) if "frames_done" in keys else -1,
        segments_done=int(data["segments_done"])
        if "segments_done" in keys else 0,
        sweeps=int(data["sweeps"]) if "sweeps" in keys else 0,
        sweeps_xpairs=(int(data["sweeps_xpairs"])
                       if "sweeps_xpairs" in keys else 0),
        host_sig=str(data["host_sig"]) if "host_sig" in keys else "",
    )
