"""dctsvd_tpu — TPU-native DCT–SVD digital watermarking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
NumPy/OpenCV desktop app (`app_dct_svd_single.py`, `dct_svd_core_secure.py`,
`watermark/*.pyc` — see SURVEY.md): password-protected non-blind DCT–SVD
watermark embedding/extraction/detection for images and video, gray and color
modes, HMAC-authenticated `.npz` metadata, extraction enhancement
(NL-means → CLAHE → unsharp), plus a TPU-first blocked (8×8) scheme variant
built around a batched one-sided Jacobi SVD kernel.

Two numerical paths, one API:
  - ``method='full'``   — parity path: whole-frame DCT (matmul form) +
    full-matrix SVD, reproducing the reference pipeline
    (ref: app_dct_svd_single.py:112-318).
  - ``method='blocked'`` — throughput path: 8×8 block DCT + batched one-sided
    Jacobi SVD, designed for the MXU/VPU; its own meta ``mode`` tag.
"""

__version__ = "0.1.0"

from dctsvd_tpu.api import embed, extract, detect  # noqa: F401
from dctsvd_tpu.utils.config import WatermarkConfig  # noqa: F401
