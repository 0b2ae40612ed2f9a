"""Test-only NumPy/OpenCV oracle of the reference algorithm.

A compact re-statement of the secure image core's math
(ref: app_dct_svd_single.py:13-318) used as the golden reference for
parity tests (SURVEY.md §4.1). Not part of the framework — tests only.
"""

from __future__ import annotations

import hashlib
import hmac

import cv2
import numpy as np

KFRAC = 0.6


def derive_key(password: str, nonce: bytes) -> bytes:
    return hashlib.sha256(password.encode("utf-8") + nonce).digest()


def keyed_perm(key: bytes, n: int) -> np.ndarray:
    rng = np.random.default_rng(int.from_bytes(key[:8], "big"))
    idx = np.arange(n)
    rng.shuffle(idx)
    return idx


def hmac_digest(key: bytes, parts) -> bytes:
    h = hmac.new(key, b"", hashlib.sha256)
    for p in parts:
        h.update(p)
    return h.digest()


def dct2(x):
    return cv2.dct(x.astype(np.float32))


def idct2(x):
    return cv2.idct(x.astype(np.float32))


def psnr(a, b):
    a = a.astype(np.float32)
    b = b.astype(np.float32)
    mse = float(np.mean((a - b) ** 2))
    if mse <= 1e-12:
        return 99.0
    return 20.0 * np.log10(255.0 / max(np.sqrt(mse), 1e-12))


def ssim(img1, img2):
    if img1.ndim == 3:
        img1 = cv2.cvtColor(img1, cv2.COLOR_BGR2GRAY)
    if img2.ndim == 3:
        img2 = cv2.cvtColor(img2, cv2.COLOR_BGR2GRAY)
    img1 = img1.astype(np.float32)
    img2 = img2.astype(np.float32)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    k, s = (11, 11), 1.5
    mu1 = cv2.GaussianBlur(img1, k, s)
    mu2 = cv2.GaussianBlur(img2, k, s)
    s1 = cv2.GaussianBlur(img1 * img1, k, s) - mu1 * mu1
    s2 = cv2.GaussianBlur(img2 * img2, k, s) - mu2 * mu2
    s12 = cv2.GaussianBlur(img1 * img2, k, s) - mu1 * mu2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2) + 1e-12
    return float(np.mean(num / den))


def nc(a, b):
    a = a.astype(np.float32).ravel()
    b = b.astype(np.float32).ravel()
    a = a - a.mean()
    b = b - b.mean()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-8))


def embed_gray(cover_bgr: np.ndarray, wm_bgr: np.ndarray, alpha: float,
               password: str, nonce: bytes, kfrac: float = KFRAC):
    """Returns (stego_bgr, meta_dict). Mirrors app_dct_svd_single.py:168-190."""
    h, w = cover_bgr.shape[:2]
    key = derive_key(password, nonce)
    wm = cv2.resize(wm_bgr, (w, h), interpolation=cv2.INTER_AREA)
    ycc = cv2.cvtColor(cover_bgr, cv2.COLOR_BGR2YCrCb)
    y = ycc[..., 0].astype(np.float32)
    wy = cv2.cvtColor(wm, cv2.COLOR_BGR2GRAY).astype(np.float32)
    idx = keyed_perm(key, h * w)
    wy_s = wy.reshape(-1)[idx].reshape(h, w).astype(np.float32)

    c = dct2(y)
    uc, sc, vct = np.linalg.svd(c, full_matrices=False)
    wmc = dct2(wy_s)
    uw, sw, vwt = np.linalg.svd(wmc, full_matrices=False)
    l = min(len(sc), len(sw))
    k = max(8, int(kfrac * l))
    s_ = sc.copy()
    s_[:k] = sc[:k] + alpha * sw[:k]
    cw = (uc @ np.diag(s_) @ vct).astype(np.float32)
    yw = idct2(cw)
    y8 = np.clip(yw, 0, 255).astype(np.uint8)
    out = cv2.cvtColor(cv2.merge([y8, ycc[..., 1], ycc[..., 2]]),
                       cv2.COLOR_YCrCb2BGR)
    digest = hmac_digest(key, [sc.tobytes(), uw.tobytes(), vwt.tobytes()])
    meta = dict(mode="gray", payload_type="image", Sc=sc, Uw=uw, Vwt=vwt,
                Sw=sw, shape=np.array((h, w)), alpha=float(alpha),
                kfrac=float(kfrac),
                nonce=np.frombuffer(nonce, np.uint8),
                digest=np.frombuffer(digest, np.uint8))
    return out, meta, yw


def embed_color(cover_bgr: np.ndarray, wm_bgr: np.ndarray, alpha: float,
                password: str, nonce: bytes, kfrac: float = KFRAC):
    """Mirrors app_dct_svd_single.py:121-167."""
    h, w = cover_bgr.shape[:2]
    key = derive_key(password, nonce)
    wm = cv2.resize(wm_bgr, (w, h), interpolation=cv2.INTER_AREA)
    idx = keyed_perm(key, h * w)
    chans = cv2.split(cover_bgr.astype(np.float32))
    wchans = cv2.split(wm.astype(np.float32))
    s_list, uw_list, vwt_list, sw_list, out_list = [], [], [], [], []
    for ch, wch in zip(chans, wchans):
        wch_s = wch.reshape(-1)[idx].reshape(h, w).astype(np.float32)
        c = dct2(ch)
        uc, sc, vct = np.linalg.svd(c, full_matrices=False)
        cw_ = dct2(wch_s)
        uw, sw, vwt = np.linalg.svd(cw_, full_matrices=False)
        l = min(len(sc), len(sw))
        k = max(8, int(kfrac * l))
        s_ = sc.copy()
        s_[:k] = sc[:k] + alpha * sw[:k]
        rec = (uc @ np.diag(s_) @ vct).astype(np.float32)
        out_list.append(np.clip(idct2(rec), 0, 255).astype(np.uint8))
        s_list.append(sc)
        uw_list.append(uw)
        vwt_list.append(vwt)
        sw_list.append(sw)
    stego = cv2.merge(out_list)
    digest = hmac_digest(key, [s.tobytes() for s in s_list]
                         + [u.tobytes() for u in uw_list]
                         + [v.tobytes() for v in vwt_list])
    meta = dict(mode="color", payload_type="image",
                Sb=s_list[0], Sg=s_list[1], Sr=s_list[2],
                UWb=uw_list[0], VWbt=vwt_list[0], SWb=sw_list[0],
                UWg=uw_list[1], VWgt=vwt_list[1], SWg=sw_list[1],
                UWr=uw_list[2], VWrt=vwt_list[2], SWr=sw_list[2],
                shape=np.array((h, w)), alpha=float(alpha),
                kfrac=float(kfrac),
                nonce=np.frombuffer(nonce, np.uint8),
                digest=np.frombuffer(digest, np.uint8))
    return stego, meta


def extract_gray_raw(stego_bgr: np.ndarray, meta: dict, password: str):
    """Up to the normalized u8 plane, before NLM/CLAHE (deterministic part)."""
    h, w = (int(v) for v in meta["shape"])
    key = derive_key(password, bytes(meta["nonce"].tobytes()))
    sc, uw, vwt = meta["Sc"], meta["Uw"], meta["Vwt"]
    expected = hmac_digest(key, [sc.tobytes(), uw.tobytes(), vwt.tobytes()])
    if not hmac.compare_digest(expected, bytes(meta["digest"].tobytes())):
        raise ValueError("bad password")
    y = cv2.cvtColor(stego_bgr, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float32)
    s_cw = np.linalg.svd(dct2(y), compute_uv=False)
    l = min(len(sc), len(s_cw), uw.shape[0], vwt.shape[0])
    k = max(8, int(float(meta["kfrac"]) * l))
    sw_hat = (s_cw[:l] - sc[:l]) / max(float(meta["alpha"]), 1e-8)
    sw_hat[k:] = 0
    wm_hat = (uw[:l, :l] @ np.diag(sw_hat) @ vwt[:l, :l]).astype(np.float32)
    full = np.zeros((h, w), np.float32)
    full[:l, :l] = wm_hat
    wy_s = idct2(full)
    idx = keyed_perm(key, h * w)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(idx.size)
    wy = wy_s.reshape(-1)[inv].reshape(h, w)
    wy = cv2.normalize(wy, None, 0, 255, cv2.NORM_MINMAX)
    return np.clip(wy, 0, 255).astype(np.uint8)


def extract_color_raw(stego_bgr: np.ndarray, meta: dict, password: str):
    """Per-channel color extract up to the normalized u8 merge, before
    colored-NLM/enhance (mirrors app_dct_svd_single.py:232-275 — the
    deterministic part, like extract_gray_raw)."""
    h, w = (int(v) for v in meta["shape"])
    key = derive_key(password, bytes(meta["nonce"].tobytes()))
    s_l = [meta[k] for k in ("Sb", "Sg", "Sr")]
    uw_l = [meta[k] for k in ("UWb", "UWg", "UWr")]
    vwt_l = [meta[k] for k in ("VWbt", "VWgt", "VWrt")]
    expected = hmac_digest(key, [s.tobytes() for s in s_l]
                           + [u.tobytes() for u in uw_l]
                           + [v.tobytes() for v in vwt_l])
    if not hmac.compare_digest(expected, bytes(meta["digest"].tobytes())):
        raise ValueError("bad password")
    alpha = max(float(meta["alpha"]), 1e-8)
    kfrac = float(meta["kfrac"])
    idx = keyed_perm(key, h * w)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(idx.size)
    outs = []
    for ch, sc, uw, vwt in zip(cv2.split(stego_bgr.astype(np.float32)),
                               s_l, uw_l, vwt_l):
        s_cw = np.linalg.svd(dct2(ch), compute_uv=False)
        l = min(len(sc), len(s_cw), uw.shape[0], vwt.shape[0])
        k = max(8, int(kfrac * l))
        sw_hat = (s_cw[:l] - sc[:l]) / alpha
        sw_hat[k:] = 0
        wm_hat = (uw[:l, :l] @ np.diag(sw_hat)
                  @ vwt[:l, :l]).astype(np.float32)
        full = np.zeros((h, w), np.float32)
        full[:l, :l] = wm_hat
        wch = idct2(full).reshape(-1)[inv].reshape(h, w)
        wch = cv2.normalize(wch, None, 0, 255, cv2.NORM_MINMAX)
        outs.append(np.clip(wch, 0, 255).astype(np.uint8))
    return cv2.merge(outs)


def detect(stego_bgr: np.ndarray, meta: dict):
    """Mirrors app_dct_svd_single.py:291-318."""
    alpha = max(float(meta["alpha"]), 1e-8)
    if str(meta["mode"]) == "gray":
        y = cv2.cvtColor(stego_bgr,
                         cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float32)
        s_cw = np.linalg.svd(dct2(y), compute_uv=False)
        sc, sw = meta["Sc"], meta["Sw"]
        l = min(len(sc), len(s_cw), len(sw))
        return nc(sw[:l], (s_cw[:l] - sc[:l]) / alpha)
    scores = []
    for ch, sk, swk in zip(cv2.split(stego_bgr.astype(np.float32)),
                           ("Sb", "Sg", "Sr"), ("SWb", "SWg", "SWr")):
        s_cw = np.linalg.svd(dct2(ch), compute_uv=False)
        sc, sw = meta[sk], meta[swk]
        l = min(len(sc), len(s_cw), len(sw))
        scores.append(nc(sw[:l], (s_cw[:l] - sc[:l]) / alpha))
    return float(np.mean(scores))
