"""Measure the host<->device link on the attached chip.

The video e2e number (bench --config video) is bounded by three
independent resources: the host codecs (measured: codec-only fps), the
device step (measured: chained-accumulator marked-fps), and the host
link moving marked frames up and back.  This probe measures the third
directly so the split metric can attribute the e2e gap:

  up      host->device MB/s for a [4,1080,1920] u8 batch (one chunk)
  down    device->host MB/s for the same
  rt      the full dispatch round trip the embed loop pays per chunk:
          upload + fused gray embed + download of marked frames

Run: python tools/probe_link.py
"""
import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # run from anywhere


def main():
    import jax
    import jax.numpy as jnp
    from dctsvd_tpu.models import video as mv

    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    chunk = rng.integers(0, 256, (4, 1080, 1920), np.uint8)
    nbytes = chunk.nbytes / 1e6
    dev = jax.devices()[0]

    # warm the transfer path + compile the embed
    d = jax.device_put(chunk, dev)
    jax.block_until_ready(d)
    _ = np.asarray(d)
    sw = mv._wm_svd_blocked(jnp.asarray(
        rng.integers(0, 256, (1080, 1920), np.uint8)))[1]
    alpha = jnp.float32(0.1)
    marked, s = mv._embed_frame_gray_blocked(d, sw, alpha)
    jax.block_until_ready((marked, s))
    _ = np.asarray(marked)

    for name, fn in [
        ("up", lambda: jax.block_until_ready(jax.device_put(chunk, dev))),
        ("down", lambda: np.asarray(d)),
    ]:
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        print(f"{name:5s} {nbytes / best:7.1f} MB/s  "
              f"({best * 1e3:6.1f} ms per 4-frame gray chunk)")

    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        m, _s = mv._embed_frame_gray_blocked(
            jax.device_put(chunk, dev), sw, alpha)
        _ = np.asarray(m)
        best = min(best, time.time() - t0)
    print(f"rt    {best * 1e3:7.1f} ms per 4-frame chunk round trip "
          f"({4 / best:5.1f} marked fps incl. link)")


if __name__ == "__main__":
    main()
