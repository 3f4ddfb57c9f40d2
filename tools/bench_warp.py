"""Micro-bench of warp variants on the real TPU.

Chains distinct inputs inside one jitted lax.scan (the axon layer caches
identical repeated device calls; per-call host syncs cost ~100-250 ms RTT).
Usage: python tools/bench_warp.py [iters] [variant ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def timed(fn, x0, iters):
    import jax
    import jax.numpy as jnp

    def body(c, i):
        s = fn(c)
        return x0 + (s * 1e-20 + i * 1e-6), None

    run = jax.jit(lambda x: jax.lax.scan(
        body, x, jnp.arange(iters, dtype=jnp.float32))[0])
    t0 = time.time()
    run(x0).block_until_ready()
    compile_s = time.time() - t0
    t0 = time.time()
    run(x0 + 1.0).block_until_ready()
    return (time.time() - t0) / iters, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from zuds_tpu.ops.resample import (upsample_mapping, warp_shift_image,
                                       warp_shift_image_mask, box_mask_or)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    variants = sys.argv[2:] or ['img', 'img_mask', 'box_or']
    H, W = 3080, 3072
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(150., 5., (H, W)).astype('f4'))
    mask = jnp.asarray((rng.random((H, W)) < 0.001).astype('i4') * 64)
    step = 32
    ny, nx = (H - 1) // step + 2, (W - 1) // step + 2
    gu = (np.arange(nx, dtype='f4') * step)[None, :] + \
        1.7 * np.sin(np.arange(ny, dtype='f4') / 9)[:, None]
    gv = (np.arange(ny, dtype='f4') * step)[:, None] + \
        1.3 * np.cos(np.arange(nx, dtype='f4') / 7)[None, :]
    u, v = upsample_mapping(jnp.asarray(gu), jnp.asarray(gv), (H, W), step)

    fns = {
        'img': lambda x: jnp.sum(warp_shift_image(x, u, v, window=4)[0]),
        'img_mask': lambda x: jnp.sum(
            warp_shift_image_mask(x, mask, u, v, window=4)[0]),
        'box_or': lambda x: jnp.sum(
            (box_mask_or(mask | x.astype(jnp.int32) % 2, reach=7)
             ).astype(jnp.float32)) + jnp.sum(x) * 1e-20,
        'img_w2': lambda x: jnp.sum(warp_shift_image(x, u, v, window=2)[0]),
    }
    from zuds_tpu.ops.resample import warp_shift_mask
    fns['mask_sep'] = lambda x: jnp.sum(
        (warp_shift_mask(mask | x.astype(jnp.int32) % 2, u, v, window=4)
         ).astype(jnp.float32)) + jnp.sum(x) * 1e-20
    from zuds_tpu.ops.resample import warp_shift_image_sep
    fns['sep1'] = lambda x: jnp.sum(
        warp_shift_image_sep(x, u, v, window=4, order=1)[0])
    fns['sep0'] = lambda x: jnp.sum(
        warp_shift_image_sep(x, u, v, window=4, order=0)[0])
    from zuds_tpu.ops.resample import warp_shift_sep_image_mask
    fns['fused_sep'] = lambda x: jnp.sum(
        warp_shift_sep_image_mask(x, mask, u, v, window=4, order=1)[0]
    ) + jnp.sum(warp_shift_sep_image_mask(
        x, mask, u, v, window=4, order=1)[1].astype(jnp.float32)) * 1e-20

    for name in variants:
        per, comp = timed(fns[name], img, iters)
        print(f'{name:12s} {per * 1e3:8.2f} ms  (compile {comp:.0f}s)',
              flush=True)


if __name__ == '__main__':
    main()
