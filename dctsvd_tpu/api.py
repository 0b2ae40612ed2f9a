"""Public path-based API mirroring the reference signatures.

``embed / extract / detect`` keep the reference's call shape
(ref: app_dct_svd_single.py:112-114,192,291) while running the numeric
pipeline on device. Array-in/array-out variants live in
``dctsvd_tpu.models.image`` (parity path) and ``dctsvd_tpu.models.blocked``
(throughput path).
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dctsvd_tpu.io import image_io, meta as metaio
from dctsvd_tpu.models import image as m_image
from dctsvd_tpu.ops import color as c_ops
from dctsvd_tpu.ops import resize as r_ops
from dctsvd_tpu.utils import crypto
from dctsvd_tpu.utils.xfer import to_numpy
from dctsvd_tpu.utils.config import DETECT_THRESH_DEFAULT, K_FRAC_DEFAULT


class _OpenModeSentinel:
    """Explicit opt-in to the password-less "open" mode (see OPEN_MODE)."""

    def __repr__(self) -> str:  # pragma: no cover
        return "dctsvd_tpu.OPEN_MODE"

    def __bool__(self) -> bool:
        return False             # behaves like "no password" downstream


#: Pass as ``password=`` to *explicitly* request the legacy open mode
#: (no permutation, no HMAC — the separated core's behavior,
#: ref: dct_svd_core_secure.py:101-150). The reference's authoritative app
#: REFUSES to embed without a password (ref: app_dct_svd_single.py:115-116),
#: so an implicit ``password=None`` embeds with a UserWarning: the insecure
#: path must never be the silent path of least resistance.
OPEN_MODE = _OpenModeSentinel()


def _embed_credentials(password):
    """(key, nonce) for an embed; warns when open mode was NOT explicit."""
    if password:
        nonce = crypto.make_nonce()
        return crypto.derive_key(password, nonce), nonce
    if password is not OPEN_MODE:
        warnings.warn(
            "embedding without a password produces an UNAUTHENTICATED "
            "open-mode meta (no keyed permutation, no HMAC). Pass a "
            "password, or password=dctsvd_tpu.OPEN_MODE to opt in "
            "explicitly.", UserWarning, stacklevel=3)
    return None, None


def embed(cover_path: str, wm_source: str, out_path: str, meta_path: str,
          alpha: float = 0.1, color: bool = False,
          password: Optional[str] = None, kfrac: float = K_FRAC_DEFAULT,
          method: str = "full") -> Tuple[str, str, float, float]:
    """Embed a watermark image into a cover image.

    Returns (out_path, meta_path, psnr, ssim), exactly like the reference
    (ref: app_dct_svd_single.py:112-190). With a password the full secure
    pipeline applies. ``password=OPEN_MODE`` selects the legacy open mode
    (no permutation, no HMAC — the separated core's behavior,
    ref: dct_svd_core_secure.py:101-150); a plain ``password=None`` also
    embeds open-mode but emits a UserWarning, because the insecure path
    must be a choice, not a forgotten kwarg.
    """
    cover = image_io.read_bgr(cover_path)
    wm = image_io.read_bgr(wm_source)
    h, w = cover.shape[:2]

    key, nonce = _embed_credentials(password)

    wm_rs = to_numpy(r_ops.resize_area_u8(jnp.asarray(wm), h, w))

    if method == "blocked":
        from dctsvd_tpu.models import blocked as m_blocked
        return m_blocked.embed_paths(cover, wm_rs, out_path, meta_path,
                                     alpha=alpha, color=color, key=key,
                                     nonce=nonce, kfrac=kfrac)

    # The full-plane Fisher–Yates shuffle is O(H·W) host work the blocked
    # path never uses — derive it only on the full (parity) path.
    idx = (crypto.permutation_indices(key, h * w) if key is not None
           else np.arange(h * w))
    out_path = metaio.default_stego_path(out_path)
    if color:
        res = m_image.embed_color(jnp.asarray(cover), jnp.asarray(wm_rs),
                                  jnp.asarray(idx), jnp.float32(alpha),
                                  kfrac=kfrac)
        s_bgr = np.asarray(res.s_cover)
        uw = np.asarray(res.uw)
        vwt = np.asarray(res.vwt)
        sw = np.asarray(res.sw)
        digest = metaio.color_digest(key, s_bgr, uw, vwt) if key else None
        image_io.write_png(out_path, to_numpy(res.stego_bgr))
        meta_path = metaio.save_color_meta(
            meta_path, s_bgr=s_bgr, uw=uw, vwt=vwt, sw=sw,
            shape=(h, w), alpha=alpha, kfrac=kfrac,
            nonce=nonce, digest=digest)
    else:
        wm_gray = to_numpy(c_ops.bgr_to_gray(jnp.asarray(wm_rs)))
        res = m_image.embed_gray(jnp.asarray(cover), jnp.asarray(wm_gray),
                                 jnp.asarray(idx), jnp.float32(alpha),
                                 kfrac=kfrac)
        sc = np.asarray(res.sc)
        uw = np.asarray(res.uw)
        vwt = np.asarray(res.vwt)
        digest = metaio.gray_digest(key, sc, uw, vwt) if key else None
        image_io.write_png(out_path, to_numpy(res.stego_bgr))
        meta_path = metaio.save_gray_meta(
            meta_path, sc=sc, uw=uw, vwt=vwt,
            sw=np.asarray(res.sw), shape=(h, w),
            alpha=alpha, kfrac=kfrac, nonce=nonce,
            digest=digest)
    return out_path, meta_path, float(res.psnr), float(res.ssim)


def _restore_meta_scale(stego: np.ndarray, meta: metaio.Meta) -> np.ndarray:
    """A stego rescaled after embedding (thumbnail, re-encode pipeline)
    otherwise hard-crashes both schemes with a shape mismatch deep in
    the device graph — the reference fails the same way (its stored
    ``Sc`` has the embed-time length, ref app_dct_svd_single.py:204-210).
    The meta records the embed-time shape, so restore it host-side:
    INTER_LINEAR up — exactly the resize50-restore regime the robustness
    battery measures (detect ~0.8 after a 50 % round trip, bench
    --config robustness) — and INTER_AREA down for an upscaled copy."""
    if not meta.shape or stego.shape[:2] == tuple(meta.shape):
        return stego
    import cv2
    h, w = meta.shape
    up = h * w >= stego.shape[0] * stego.shape[1]
    warnings.warn(
        f"stego is {stego.shape[1]}x{stego.shape[0]} but the meta was "
        f"written at {w}x{h}; rescaling to the embed-time shape "
        f"(scores degrade like the resize-restore attack rows)")
    return cv2.resize(stego, (w, h), interpolation=(
        cv2.INTER_LINEAR if up else cv2.INTER_AREA))


def extract(stego_path: str, meta_path: str, out_path: str,
            password: Optional[str] = None, normalize: bool = True,
            enhance: bool = True) -> str:
    """HMAC-gated extraction (ref: app_dct_svd_single.py:192-282). Metas
    written without a password (legacy open mode) extract with
    ``password=None`` — no permutation, no HMAC."""
    meta = metaio.load_meta(meta_path)
    stego = _restore_meta_scale(image_io.read_bgr(stego_path), meta)
    h, w = meta.shape
    if meta.digest is not None:
        crypto.require_password(password)
        key = crypto.derive_key(password, meta.nonce)
    else:
        key = None

    if meta.is_blocked:
        # the blocked scheme derives its own (block, intra) indices —
        # the O(H*W) full-plane Fisher–Yates below is exactly the host
        # cost the blocked embed exists to avoid (hundreds of ms at 4K)
        from dctsvd_tpu.models import blocked as m_blocked
        return m_blocked.extract_paths(stego, meta, out_path, key,
                                       normalize=normalize, enhance=enhance)

    idx = (crypto.permutation_indices(key, h * w) if key is not None
           else np.arange(h * w))
    inv = crypto.inverse_permutation(idx)

    uw, vwt, _sw = meta.wm_basis_stacked()
    s_cover = meta.s_cover_stacked()
    if key is not None:
        if meta.is_color:
            expected = metaio.color_digest(key, s_cover, uw, vwt)
        else:
            expected = metaio.gray_digest(key, s_cover, uw, vwt)
        if not crypto.digests_equal(expected, meta.digest):
            raise ValueError("Wrong password or corrupted meta "
                             "(HMAC verification failed).")

    alpha = jnp.float32(meta.alpha)
    if meta.is_color:
        wm = m_image.extract_color(jnp.asarray(stego), jnp.asarray(s_cover),
                                   jnp.asarray(uw), jnp.asarray(vwt),
                                   jnp.asarray(inv), alpha,
                                   kfrac=meta.kfrac, normalize=normalize,
                                   shape=(h, w))
    else:
        wm = m_image.extract_gray(jnp.asarray(stego), jnp.asarray(s_cover),
                                  jnp.asarray(uw), jnp.asarray(vwt),
                                  jnp.asarray(inv), alpha,
                                  kfrac=meta.kfrac, normalize=normalize,
                                  shape=(h, w))
    wm_np = to_numpy(wm)
    if enhance:
        from dctsvd_tpu.models import enhance as m_enhance
        wm_np = (m_enhance.enhance_color_np(wm_np) if meta.is_color
                 else m_enhance.enhance_gray_np(wm_np))
    out_path = metaio.default_wm_path(out_path)
    image_io.write_png(out_path, wm_np)
    return out_path


def detect(stego_path: str, meta_path: str,
           thresh: Optional[float] = None,
           resync: bool = False,
           rot_range: float = 0.0,
           rot_step: float = 0.05) -> Tuple[bool, float]:
    """No-password NC detection (ref: app_dct_svd_single.py:291-318).

    Parity-mode metas score with the reference's global NC against its
    0.6 threshold. Blocked-mode metas score with the hardened
    band-median statistic (models/blocked._band_nc: per-band NC gated by
    scale consistency and keyed-presence) against the ROC-backed 0.30
    (utils/config.DETECT_THRESH_BLOCKED — mark-free negatives ≤ 0.03,
    attacked positives ≥ 0.375 over 240 hosts × the alpha grid;
    ``bench.py --config detect-roc`` reproduces the table). An explicit
    ``thresh`` overrides either default. ``resync=True`` (blocked metas)
    searches candidate translations when the aligned score misses — the
    8×8 block grid makes an unaided blocked detect collapse under even a
    1 px shift (models/blocked.detect_gray_resync); ``rot_range`` > 0
    additionally searches attacker rotations within ±rot_range degrees
    at rot_step resolution (counter-rotation resampling — the angle grid
    must be fine, see models/blocked's resync section comment). A stego
    whose size differs from the meta's embed-time shape is rescaled back
    first (_restore_meta_scale)."""
    meta = metaio.load_meta(meta_path)
    stego = _restore_meta_scale(image_io.read_bgr(stego_path), meta)

    if meta.is_blocked:
        from dctsvd_tpu.models import blocked as m_blocked
        from dctsvd_tpu.utils.config import DETECT_THRESH_BLOCKED
        return m_blocked.detect_paths(
            stego, meta,
            DETECT_THRESH_BLOCKED if thresh is None else thresh,
            resync=resync, rot_range=rot_range, rot_step=rot_step)
    if thresh is None:
        thresh = DETECT_THRESH_DEFAULT

    alpha = jnp.float32(meta.alpha)
    _uw, _vwt, sw = meta.wm_basis_stacked()
    s_cover = meta.s_cover_stacked()
    if meta.is_color:
        score = m_image.detect_color(jnp.asarray(stego),
                                     jnp.asarray(s_cover), jnp.asarray(sw),
                                     alpha)
    else:
        score = m_image.detect_gray(jnp.asarray(stego), jnp.asarray(s_cover),
                                    jnp.asarray(sw), alpha)
    score = float(score)
    return bool(score >= thresh), score


def embed_payload(cover_path: str, payload, out_path: str, meta_path: str,
                  alpha: float = 0.1, password: Optional[str] = None,
                  kfrac: float = K_FRAC_DEFAULT, repeat: int = 8,
                  method: str = "full") -> Tuple[str, str, float, float]:
    """Embed a text/JSON/bytes payload as a bit-plane watermark.

    Implements the legacy core's intended text/JSON capability
    (ref: dct_svd_core_secure.py:101-131; that module's own extract path is
    broken — SURVEY.md §2.2). ``password=OPEN_MODE`` is the explicit legacy
    open mode (no permutation, no HMAC; bare ``password=None`` warns — see
    :func:`embed`); with a password the full secure pipeline applies.
    ``repeat`` adds bit-level repetition coding for robustness.
    ``method='blocked'`` routes the bit-plane through the throughput
    scheme (per-8×8-block SVD) instead of the full-frame parity scheme.
    """
    from dctsvd_tpu.models import payload as m_payload

    cover = image_io.read_bgr(cover_path)
    h, w = cover.shape[:2]
    data, ptype = m_payload.payload_to_bytes(payload)
    plane = m_payload.bytes_to_bitplane(data, h, w, repeat=repeat)

    key, nonce = _embed_credentials(password)

    if method == "blocked":
        from dctsvd_tpu.models import blocked as m_blocked
        return m_blocked.embed_paths(
            cover, plane, out_path, meta_path, alpha=alpha, color=False,
            key=key, nonce=nonce, kfrac=kfrac, payload_type=ptype,
            extra_meta={"repeat": int(repeat)})

    idx = (crypto.permutation_indices(key, h * w) if key is not None
           else np.arange(h * w))
    res = m_image.embed_gray(jnp.asarray(cover), jnp.asarray(plane),
                             jnp.asarray(idx), jnp.float32(alpha),
                             kfrac=kfrac)
    sc = np.asarray(res.sc)
    uw = np.asarray(res.uw)
    vwt = np.asarray(res.vwt)
    digest = metaio.gray_digest(key, sc, uw, vwt) if key else None
    out_path = metaio.default_stego_path(out_path)
    image_io.write_png(out_path, to_numpy(res.stego_bgr))
    meta_path = metaio.save_gray_meta(
        meta_path, sc=sc, uw=uw, vwt=vwt,
        sw=np.asarray(res.sw), shape=(h, w), alpha=alpha,
        kfrac=kfrac, nonce=nonce, digest=digest,
        payload_type=ptype,
        extra={"repeat": int(repeat)})
    return out_path, meta_path, float(res.psnr), float(res.ssim)


def extract_payload(stego_path: str, meta_path: str,
                    password: Optional[str] = None):
    """Recover an embedded text/JSON/bytes payload
    (the legacy core's intended extract-text path,
    ref: dct_svd_core_secure.py:210-243)."""
    from dctsvd_tpu.models import payload as m_payload

    meta = metaio.load_meta(meta_path)
    stego = _restore_meta_scale(image_io.read_bgr(stego_path), meta)
    h, w = meta.shape
    repeat = int(meta.arrays.get("repeat", 1))

    if meta.is_blocked:
        from dctsvd_tpu.models import blocked as m_blocked
        key = None
        if meta.digest is not None:
            crypto.require_password(password)
            key = crypto.derive_key(password, meta.nonce)
        plane = m_blocked.extract_array(stego, meta, key, normalize=True)
        data = m_payload.bitplane_to_bytes(plane, repeat=repeat)
        return m_payload.bytes_to_payload(data, meta.payload_type)

    if meta.digest is not None:
        crypto.require_password(password)
        key = crypto.derive_key(password, meta.nonce)
        expected = metaio.gray_digest(key, meta.arrays["Sc"],
                                      meta.arrays["Uw"],
                                      meta.arrays["Vwt"])
        if not crypto.digests_equal(expected, meta.digest):
            raise ValueError("Wrong password or corrupted meta "
                             "(HMAC verification failed).")
        idx = crypto.permutation_indices(key, h * w)
        inv = crypto.inverse_permutation(idx)
    else:
        inv = np.arange(h * w)

    plane = m_image.extract_gray(jnp.asarray(stego),
                                 jnp.asarray(meta.arrays["Sc"]),
                                 jnp.asarray(meta.arrays["Uw"]),
                                 jnp.asarray(meta.arrays["Vwt"]),
                                 jnp.asarray(inv), jnp.float32(meta.alpha),
                                 kfrac=meta.kfrac, normalize=True,
                                 shape=(h, w))
    data = m_payload.bitplane_to_bytes(to_numpy(plane), repeat=repeat)
    return m_payload.bytes_to_payload(data, meta.payload_type)
