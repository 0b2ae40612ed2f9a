"""Host-boundary image IO.

File decode/encode stays on host (SURVEY.md layer map L0: OpenCV/imageio only
at the host I/O boundary). Everything returned is a plain uint8 BGR ndarray —
the device pipelines take it from there.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    _HAVE_CV2 = True
except Exception:  # pragma: no cover - cv2 is present in CI images
    cv2 = None
    _HAVE_CV2 = False


def read_bgr(path: str) -> np.ndarray:
    """Read an image as uint8 BGR [H, W, 3] (ref: app_dct_svd_single.py:15-19
    raises on unreadable input)."""
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"Cannot open image: {path}")
        return img
    import imageio.v3 as iio
    rgb = iio.imread(path)
    if rgb.ndim == 2:
        rgb = np.stack([rgb] * 3, axis=-1)
    return np.ascontiguousarray(rgb[..., 2::-1])


def write_png(path: str, img: np.ndarray, compression: int = 0) -> str:
    """Write BGR/gray uint8 as PNG. The reference writes stego at PNG
    compression level 0 (ref: app_dct_svd_single.py:150,180) so no quality
    is lost; we keep that contract."""
    if _HAVE_CV2:
        ok = cv2.imwrite(path, img, [cv2.IMWRITE_PNG_COMPRESSION, compression])
        if not ok:
            raise IOError(f"Failed to write {path}")
        return path
    import imageio.v3 as iio
    out = img if img.ndim == 2 else img[..., 2::-1]
    iio.imwrite(path, out)
    return path
