"""Per-stage device timing of detect_sources on the real TPU.

Uses the dbg_stop_after truncation knob (same caveat as
tools/bisect_pipeline.py: only whole-program numbers are strictly
comparable across code changes — XLA schedules each truncation
differently — but stage deltas localize the budget).

Usage: python tools/bench_detect.py [iters] [stage ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

H, W = 3080, 3072


def main():
    import jax
    import jax.numpy as jnp
    from zuds_tpu.ops.detect import detect_sources

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    stages = sys.argv[2:] or ['filt', 'compact', 'ccl', 'cell', 'deblend',
                              'stats', None]

    rng = np.random.default_rng(3)
    img = rng.normal(0.0, 5.0, (H, W)).astype('f4')
    # ~600 sources of varying size -> few 10k detected pixels (realistic
    # subtraction frame has fewer; a crowded sci frame has more)
    k = 10
    yy, xx = np.mgrid[-k:k + 1, -k:k + 1]
    for _ in range(600):
        x = rng.integers(k + 2, W - k - 2)
        y = rng.integers(k + 2, H - k - 2)
        f = rng.uniform(200, 20000)
        sig = rng.uniform(1.5, 3.0)
        img[y - k:y + k + 1, x - k:x + k + 1] += (
            f * np.exp(-(xx ** 2 + yy ** 2) / (2 * sig * sig))
            / (2 * np.pi * sig * sig)).astype('f4')
    imgj = jnp.asarray(img)
    rmsj = jnp.full((H, W), 5.0, jnp.float32)

    # plain loop over DISTINCT inputs with one final sync (the bisect
    # pattern) — a lax.scan-wrapped timing body intermittently wedges the
    # remote compile service for these large programs (r3 observation),
    # and distinct inputs defeat the axon request cache just as well
    prev = 0.0
    for st in stages:
        @jax.jit
        def fn(x, _st=st):
            out = detect_sources(x, rmsj, return_labels=False,
                                 dbg_stop_after=_st)
            if _st is None:
                return out['flux'].sum() + out['n'].astype(jnp.float32)
            return out['dbg'].astype(jnp.float32)

        t0 = time.time()
        fn(imgj).block_until_ready()
        comp = time.time() - t0
        t0 = time.time()
        acc = None
        for i in range(iters):
            acc = fn(imgj + (i + 1) * 1e-3)
        acc.block_until_ready()
        per = (time.time() - t0) / iters
        print(f'through {st or "FULL":8s} {per * 1e3:9.2f} ms '
              f'(delta {(per - prev) * 1e3:+9.2f} ms, compile {comp:.0f}s)',
              flush=True)
        prev = per


if __name__ == '__main__':
    main()
