"""Micro-bench: compaction primitives at quadrant scale on the real TPU.

Plain-loop timing over distinct chained inputs (CLAUDE.md tunnel rules).
Usage: python tools/bench_compact.py [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

H, W = 3080, 3072
CAP = 65536


def timed(fn, x0, iters):
    import jax
    t0 = time.time()
    fn(x0).block_until_ready()
    comp = time.time() - t0
    t0 = time.time()
    acc = None
    for i in range(iters):
        acc = fn(x0 + (i + 1) * 1e-3)
    acc.block_until_ready()
    return (time.time() - t0) / iters, comp


def main():
    import jax
    import jax.numpy as jnp

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (H, W)).astype('f4'))
    thr = 4.0   # ~0.3% of pixels

    @jax.jit
    def f_nonzero(x):
        det = (x > thr).ravel()
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        return pidx.sum()

    @jax.jit
    def f_inv_scatter(x):
        det = (x > thr).ravel()
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        inv = jnp.full(H * W, -1, jnp.int32).at[pidx].set(
            jnp.arange(CAP, dtype=jnp.int32))
        return inv.sum()

    @jax.jit
    def f_inv_scatter_unique(x):
        # indices_are_sorted + unique_indices: nonzero output is sorted
        # and unique by construction — does XLA exploit the promise?
        det = (x > thr).ravel()
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        inv = jnp.full(H * W, -1, jnp.int32).at[pidx].set(
            jnp.arange(CAP, dtype=jnp.int32), indices_are_sorted=True,
            unique_indices=False)   # fill duplicates at H*W-1
        return inv.sum()

    @jax.jit
    def f_cumsum_inv(x):
        # scatter-free inverse map: inv = cumsum(det) - 1 where det
        # (position of each detected pixel in the sorted compact list),
        # -1 elsewhere. One 9.4M cumsum + elementwise.
        det = (x > thr).ravel()
        c = jnp.cumsum(det.astype(jnp.int32)) - 1
        inv = jnp.where(det, c, -1)
        return inv.sum()

    @jax.jit
    def f_gather65k(x):
        det = (x > thr).ravel()
        pidx = jnp.nonzero(det, size=CAP, fill_value=H * W - 1)[0]
        return x.ravel()[pidx].sum()

    for name, fn in [('nonzero', f_nonzero),
                     ('nonzero+inv scatter', f_inv_scatter),
                     ('nonzero+inv scatter(sorted)', f_inv_scatter_unique),
                     ('cumsum inv (scatter-free)', f_cumsum_inv),
                     ('nonzero+gather', f_gather65k)]:
        per, comp = timed(fn, img, iters)
        print(f'{name:30s} {per * 1e3:8.2f} ms (compile {comp:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
