"""Tracing, profiling and throughput observability.

The reference's only observability is a per-100-frame progress print and the
GUI's PSNR/SSIM label (SURVEY.md §5). Here:

  - :func:`trace` — context manager around ``jax.profiler`` producing a
    Perfetto/XPlane dump for any pipeline section (CLI: ``--profile DIR``).
  - :class:`StageTimer` — wall-time per named stage with device sync at
    stage boundaries, so numbers mean what they say under async dispatch.
  - :class:`Throughput` — frames/sec/chip counters for the video streamer
    and batch pipelines (the north-star metric, BASELINE.json).
  - :func:`enable_debug_checks` — jax NaN/inf checking for CI (the TPU
    answer to sanitizers; on-device data races don't exist under XLA's
    functional semantics, SURVEY.md §5 'race detection').
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

logger = logging.getLogger("dctsvd_tpu")


def setup_logging(level: int = logging.INFO,
                  structured: bool = False) -> None:
    handler = logging.StreamHandler()
    if structured:
        class _Json(logging.Formatter):
            def format(self, rec):
                return json.dumps({
                    "t": round(rec.created, 3), "lvl": rec.levelname,
                    "msg": rec.getMessage(), "mod": rec.module})
        handler.setFormatter(_Json())
    else:
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(name)s: %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(level)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace (Perfetto-compatible) when log_dir is set;
    no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield
    logger.info("profiler trace written to %s", log_dir)


@dataclass
class StageTimer:
    """Accumulates wall time per stage; `stage(...)` blocks on device work
    at exit so async dispatch doesn't misattribute time."""
    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                try:
                    # jax.effects_barrier() only awaits runtime-token
                    # EFFECTS (debug/io callbacks), not ordinarily
                    # dispatched pure jits — it was a no-op here and
                    # stages recorded ~0 ms with the device time charged
                    # to whichever later stage first blocked. The device
                    # executes its queue in order, so blocking on a
                    # trivial computation enqueued NOW flushes all prior
                    # async work. (On remotely-attached chips even this
                    # can under-block — bench.py chains a device-side
                    # accumulator for that reason; per-stage numbers
                    # there are indicative, not exact.)
                    jax.block_until_ready(
                        jax.numpy.zeros(()) + jax.numpy.float32(0))
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4),
                    "calls": self.counts[k],
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}


@dataclass
class Throughput:
    """Frames/sec counter with periodic logging."""
    name: str = "frames"
    log_every: int = 100
    _n: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def add(self, n: int = 1):
        self._n += n
        if self.log_every and self._n % self.log_every == 0:
            logger.info("%s: %d processed, %.1f/s", self.name, self._n,
                        self.rate())

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._n / dt if dt > 0 else 0.0


def enable_debug_checks() -> None:
    """CI-mode numeric checks (SURVEY.md §5)."""
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
