"""Micro-bench the detect compaction primitives at quadrant scale (TPU).

Times jnp.nonzero(size=cap), the inverse-map scatter, and candidate
replacements, each as its own jitted program over chained DISTINCT inputs
(plain loop + one sync; see CLAUDE.md on the axon request cache).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

H, W = 3080, 3072
CAP = 32768


def timeit(name, fn, args, iters=4):
    # CHAINED timing: each iteration's input depends on the previous
    # iteration's OUTPUT (scalar), so the tunnel can neither cache nor
    # reorder any call; one sync at the end (CLAUDE.md timing rule).
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    carry = jnp.float32(0)
    for i in range(iters):
        out = fn(args[0] + carry * 1e-9 + np.float32(i + 1) * 1e-3,
                 *args[1:])
        carry = out.astype(jnp.float32)
    jax.block_until_ready(carry)
    per = (time.time() - t0) / iters
    print(f'{name:28s} {per * 1e3:8.2f} ms', flush=True)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (H, W)).astype('f4')
    # ~20k detected pixels
    img[(rng.random((H, W)) < 20000 / (H * W))] += 10.0
    imgj = jnp.asarray(img)

    @jax.jit
    def f_nonzero(x):
        det = (x > 5.0).ravel()
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        return pidx.sum()

    @jax.jit
    def f_nonzero_inv(x):
        det = (x > 5.0).ravel()
        ndet = jnp.sum(det.astype(jnp.int32))
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        pok = jnp.arange(CAP) < jnp.minimum(ndet, CAP)
        inv = jnp.full(H * W, -1, jnp.int32).at[pidx].set(
            jnp.where(pok, jnp.arange(CAP, dtype=jnp.int32), -1))
        return pidx.sum() + inv.sum()

    @jax.jit
    def f_cumsum_scatter(x):
        det = (x > 5.0).ravel()
        pos = jnp.cumsum(det.astype(jnp.int32)) - 1
        tgt = jnp.where(det, jnp.minimum(pos, CAP - 1), CAP)
        pidx = jnp.zeros(CAP, jnp.int32).at[tgt].set(
            jnp.arange(H * W, dtype=jnp.int32), mode='drop')
        return pidx.sum()

    @jax.jit
    def f_cumsum_only(x):
        det = (x > 5.0).ravel()
        pos = jnp.cumsum(det.astype(jnp.int32))
        return pos[-1] + pos[0]

    @jax.jit
    def f_rowsearch(x):
        det = (x > 5.0)
        c = jnp.cumsum(det.astype(jnp.int32), axis=1)      # (H, W) in-row
        t = c[:, -1]
        R = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(t)])
        j = jnp.arange(CAP, dtype=jnp.int32)
        # binary search rows: R[y] <= j < R[y+1]
        lo = jnp.zeros(CAP, jnp.int32)
        hi = jnp.full(CAP, H, jnp.int32)
        for _ in range(12):
            mid = (lo + hi) // 2
            go = R[mid + 1] <= j
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        r = j - R[lo]                                       # rank in row
        # binary search within row over c[y, :]
        cf = c.ravel()
        xlo = jnp.zeros(CAP, jnp.int32)
        xhi = jnp.full(CAP, W - 1, jnp.int32)
        for _ in range(12):
            mid = (xlo + xhi) // 2
            go = cf[lo * W + mid] <= r
            xlo = jnp.where(go, mid + 1, xlo)
            xhi = jnp.where(go, xhi, mid)
        return (lo * W + xlo).sum()

    timeit('nonzero(size=32k)', f_nonzero, (imgj,))
    timeit('nonzero + inv scatter', f_nonzero_inv, (imgj,))
    timeit('cumsum+scatter-to-cap', f_cumsum_scatter, (imgj,))
    timeit('cumsum only', f_cumsum_only, (imgj,))
    timeit('row cumsum + 2x binsearch', f_rowsearch, (imgj,))


if __name__ == '__main__':
    main()
