"""MXU-formulation verdict data (VERDICT r1 next-round #2).

Any matmul-dominant batched 8x8 SVD (Newton-Schulz / QDWH polar iteration,
two-sided block rotations) reduces to batched [N, 8, 8] x [N, 8, 8]
matmuls. This measures what ONE such pass costs on the chip vs the whole
4-sweep Jacobi spectrum kernel — if a single batched-matmul pass is not
dramatically cheaper than the entire Jacobi solve, no iteration built from
them can win, closing the MXU question with hardware numbers.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.ops import wm_pallas


def timed(name, fn, *args, iters=12):
    acc = jnp.float32(0.0)
    _ = float(fn(*args, acc))
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc)
    _ = float(acc)
    dt = (time.time() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    h, w, batch = 1080, 1920, 32
    n = (h // 8) * (w // 8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (batch * 3, n, 8, 8)).astype(np.float32))
    chans = jnp.asarray(rng.standard_normal(
        (batch, 3, h, w)).astype(np.float32) * 50 + 128)
    jax.block_until_ready((x, chans))
    print(f"{batch*3*n/1e6:.2f}M 8x8 blocks", flush=True)

    @jax.jit
    def batched_matmul(x, acc):
        y = jnp.einsum("...ij,...jk->...ik", x, x,
                       precision=jax.lax.Precision.HIGHEST)
        return acc + jnp.mean(y)

    @jax.jit
    def gram(x, acc):          # A = X^T X, the polar-iteration building block
        y = jnp.einsum("...ji,...jk->...ik", x, x,
                       precision=jax.lax.Precision.HIGHEST)
        return acc + jnp.mean(y)

    @jax.jit
    def newton_schulz5(x, acc):
        # 5 polar iterations W <- 1.5 W - 0.5 W W^T W  (2 matmuls each);
        # then the eigensolve of H = U_p^T X would STILL be needed on top.
        w_ = x / 2000.0
        for _ in range(5):
            wtw = jnp.einsum("...ji,...jk->...ik", w_, w_)
            w_ = 1.5 * w_ - 0.5 * jnp.einsum("...ij,...jk->...ik", w_, wtw)
        return acc + jnp.mean(w_)

    @jax.jit
    def jacobi_spectrum(chans, acc):
        s = wm_pallas.spectrum_plane_blocks.__wrapped__(chans)
        return acc + jnp.mean(s)

    timed("ONE batched 8x8 matmul pass (3.11M blocks)", batched_matmul, x)
    timed("ONE batched Gram pass X^T X", gram, x)
    timed("Newton-Schulz polar, 5 iter (10 matmuls)", newton_schulz5, x)
    timed("ENTIRE 4-sweep Jacobi spectrum kernel", jacobi_spectrum, chans)


if __name__ == "__main__":
    sys.exit(main())
