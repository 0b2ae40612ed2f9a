"""Why does the extract-tail head cost 14 ms on ~66 MB of data?
Probe the [.., N, k] slot->natural gather formulations and the erasure
mask alone."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dctsvd_tpu.models import blocked


def timed(name, fn, *args, iters=12):
    acc = jnp.float32(0.0)
    acc2 = fn(*args, acc)
    _ = float(acc2)
    t0 = time.time()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc)
    _ = float(acc)
    print(f"{name:44s} {(time.time()-t0)/iters*1e3:8.2f} ms/iter",
          flush=True)


def main():
    b, c, n, k = 32, 3, 32400, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, c, n, 8)).astype(np.float32))
    sw = jnp.asarray(rng.random((c, n, 8)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(n))
    alpha = jnp.float32(0.12)

    @jax.jit
    def take_ax2(x, idx, acc):
        y = jnp.take(x[..., :k], idx, axis=-2)
        return acc + y.reshape(-1)[0]

    @jax.jit
    def take_minor(x, idx, acc):
        xt = jnp.swapaxes(x[..., :k], -1, -2)        # [b, c, k, n]
        y = jnp.take(xt, idx, axis=-1)
        return acc + jnp.swapaxes(y, -1, -2).reshape(-1)[0]

    @jax.jit
    def take_full8(x, idx, acc):
        y = jnp.take(x, idx, axis=-2)[..., :k]
        return acc + y.reshape(-1)[0]

    @jax.jit
    def shrink_only(x, sw, acc):
        y, bad = blocked._shrink_sw_hat(x, sw, k)
        return (acc + y.reshape(-1)[0]
                + bad.astype(jnp.float32).reshape(-1)[0])

    @jax.jit
    def head_nogather(x, sw, acc):
        raw = x / jnp.maximum(alpha, 1e-8)
        sw_hat, bad = blocked._shrink_sw_hat(raw, sw, k)
        return (acc + sw_hat.reshape(-1)[0]
                + bad.astype(jnp.float32).reshape(-1)[0])

    timed("take axis=-2 [b,c,n,4]", take_ax2, x, idx)
    timed("take minor  [b,c,4,n]", take_minor, x, idx)
    timed("take axis=-2 full 8 then slice", take_full8, x, idx)
    timed("shrink estimator only", shrink_only, x, sw)
    timed("head without gather", head_nogather, x, sw)


if __name__ == "__main__":
    sys.exit(main())


def main2():
    b, c, n, k = 32, 3, 32400, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, c, n, 8)).astype(np.float32))
    idx = jnp.asarray(rng.permutation(n))

    @jax.jit
    def lead_gather(x, idx, acc):
        xt = jnp.transpose(x[..., :k].reshape(b * c, n, k), (1, 0, 2))
        y = jnp.take(xt, idx, axis=0)                  # [n, b*c, k]
        y = jnp.transpose(y, (1, 0, 2)).reshape(b, c, n, k)
        return acc + y.reshape(-1)[0]

    @jax.jit
    def lead_gather_flat(x, idx, acc):
        xt = jnp.transpose(x[..., :k].reshape(b * c, n * k))  # [n*k, b*c]?
        return acc + xt.reshape(-1)[0]

    @jax.jit
    def onehot_seg(x, idx, acc):
        # permutation as N-segment matmul? skipped — N^2 too big
        return acc

    @jax.jit
    def transpose_only(x, acc):
        xt = jnp.transpose(x[..., :k].reshape(b * c, n, k), (1, 0, 2))
        return acc + xt.reshape(-1)[0]

    timed("transpose to [n, bc, k] only", transpose_only, x)
    timed("lead-axis gather (T, take0, T)", lead_gather, x, idx)


if __name__ == "__main__" and "--lead" in sys.argv:
    main2()
    sys.exit(0)
