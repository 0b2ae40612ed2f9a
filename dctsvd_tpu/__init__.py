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


def _machine_tag() -> str:
    """Short fingerprint of this host's ISA feature set (arch + cpuinfo
    flags). XLA:CPU AOT cache entries are compiled FOR a feature set; an
    entry produced on a wider-ISA host loads on a narrower one with only a
    'could lead to execution errors such as SIGILL' warning (seen in the
    round-3 multichip dryrun when ~/.cache rode across heterogeneous
    hosts). Keying the cache directory by this tag makes cross-machine
    reuse structurally impossible."""
    import hashlib
    import platform

    h = hashlib.sha256(platform.machine().encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith((b"flags", b"Features")):
                    h.update(line)
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache.

    The whole-frame Jacobi SVD graph takes minutes to compile on TPU; without
    a persistent cache every fresh CLI/GUI process pays that again. Opt out
    with ``DCTSVD_TPU_NO_CACHE=1``; relocate with ``DCTSVD_TPU_CACHE_DIR``
    (a machine-feature subdirectory is appended either way — see
    :func:`_machine_tag`).
    """
    import os

    if os.environ.get("DCTSVD_TPU_NO_CACHE"):
        return
    base_dir = os.environ.get("DCTSVD_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "dctsvd_tpu", "jax")
    cache_dir = os.path.join(base_dir, _machine_tag())
    try:
        import jax

        # Respect an explicitly-configured cache location: trampling a
        # dir the embedding application (or tests/conftest.py) already
        # set is a config-override bug — the package default is a
        # fallback, not a mandate. (DCTSVD_TPU_CACHE_DIR still wins over
        # a pre-set dir: it is this package's own explicit knob.)
        already = jax.config.jax_compilation_cache_dir
        if already and not os.environ.get("DCTSVD_TPU_CACHE_DIR"):
            return
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache even sub-second compiles: with a remote-attached TPU every
        # eager op dispatch pays tunnel latency, so a fresh process replays
        # dozens of ~0.5 s mini-compiles unless they're cached too.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # never make import fail over a cache knob
        pass


_setup_compilation_cache()

from dctsvd_tpu.api import (embed, extract, detect,  # noqa: E402,F401
                            embed_payload, extract_payload, OPEN_MODE)
from dctsvd_tpu.utils.config import WatermarkConfig  # noqa: E402,F401
