"""Frozen configuration for the watermarking pipelines.

The reference has no config system — plain kwargs with defaults scattered
across functions (alpha=0.1 image / 0.05 video, kfrac=0.6, thresh=0.6,
frame_interval=10, font_size=40; ref: app_dct_svd_single.py:13,112-114,
video_dct_svd.pyc l.57). This one dataclass is the single source of truth,
and the CLI maps 1:1 onto it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


K_FRAC_DEFAULT = 0.6       # fraction of leading singular values carrying the mark
ALPHA_IMAGE_DEFAULT = 0.1  # additive spread strength (images)
ALPHA_GUI_DEFAULT = 0.12   # the GUI default the reference actually ships
ALPHA_VIDEO_DEFAULT = 0.05
DETECT_THRESH_DEFAULT = 0.6
# Blocked-mode detect threshold, backed by the round-4 ROC
# characterization (bench.py --config detect-roc, 240 varied hosts ×
# alpha 0.10–0.22): with the scale + keyed-presence gates every
# mark-free negative scores ≤ 0.03 while genuine attacked positives
# reach down to 0.375 (flat-content hosts under crop — the gates no
# longer inflate those with profile-matching credit, so the reference's
# 0.6 would miss ~0.7 % of them). 0.30 gives FPR 0 / TPR 1.0 with
# ~10× margin on the negative side. Parity modes keep the reference's
# 0.6 (their statistic is the reference's own global NC).
DETECT_THRESH_BLOCKED = 0.30
FRAME_INTERVAL_DEFAULT = 10
FONT_SIZE_DEFAULT = 40
BLOCK = 8                  # blocked-path tile size (8×8 DCT blocks)


@dataclasses.dataclass(frozen=True)
class WatermarkConfig:
    """All knobs of the embed/extract/detect pipelines.

    ``method`` selects the numerical path:
      - ``'full'``    parity path — whole-frame DCT + full SVD
        (ref: app_dct_svd_single.py:168-190)
      - ``'blocked'`` TPU throughput path — 8×8 block DCT + batched Jacobi SVD
    """

    alpha: float = ALPHA_IMAGE_DEFAULT
    kfrac: float = K_FRAC_DEFAULT
    color: bool = False
    method: str = "full"            # 'full' | 'blocked'
    thresh: float = DETECT_THRESH_DEFAULT   # parity statistic's threshold;
                                            # blocked metas resolve their own
                                            # ROC-backed default when the
                                            # caller passes api.detect(...,
                                            # thresh=None)
    normalize: bool = True          # min-max normalize extracted mark
    enhance: bool = True            # NLM -> CLAHE -> unsharp chain on extract
    frame_interval: int = FRAME_INTERVAL_DEFAULT
    font_size: int = FONT_SIZE_DEFAULT
    preserve_audio: bool = False
    dtype: str = "float32"
    password: Optional[str] = None

    def replace(self, **kw) -> "WatermarkConfig":
        return dataclasses.replace(self, **kw)
