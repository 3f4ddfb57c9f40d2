"""Benchmark: full quadrant subtract+detect+photometer chain on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "quadrants/sec/chip", "vs_baseline": N}

Baseline: the reference pipeline processes ~1.1 quadrant-chains/sec per
64-core Cori Haswell node (BASELINE.md, derived from nersc/controller.py
sizing: 960 images / 64 ranks / 15 min chunks). The north-star target is
>=50 quadrants/sec/chip on TPU (BASELINE.json).

The benchmarked program is the fused batched pipeline on full-size ZTF
quadrants (3080x3072): Lanczos align of the reference + background/rms mesh
x2 + A&L kernel fit (3x3 regions) + spatially-varying convolution subtract +
matched-filter detection + connected components + moments + aperture
photometry of every candidate. Two distinct input batches alternate to
defeat cross-call caching.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zuds_tpu.parallel import PipelineConfig
    from zuds_tpu.parallel.pipeline import make_subtract_detect_pipeline
    from __graft_entry__ import _synth_inputs

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    H, W = 3080, 3072
    # PARITY configuration: kernel spatial order 4 over 3x3 regions — the
    # reference's hotpants invocation (-ko 4 -nrx 3 -nry 3,
    # zuds/hotpants.py:83-88) and this repo's own KERNEL_SPATIAL_ORDER
    # default. smax=384 gives ~42 stamps/region; each 41px stamp
    # contributes 729 valid-conv pixel rows, so the 736-unknown per-region
    # fit is strongly overdetermined (hotpants uses ~100 smaller substamps
    # per region).
    from zuds_tpu.constants import KERNEL_SPATIAL_ORDER
    cfg = PipelineConfig(height=H, width=W, ksize=15, stamp=41, smax=384,
                         order=KERNEL_SPATIAL_ORDER, nreg=3, max_det=1024,
                         interleave=2 if B % 2 == 0 else 1)

    pipe = make_subtract_detect_pipeline(cfg)

    batches = []
    for seed in (0, 1):
        args = _synth_inputs(B, H, W, cfg, seed=seed)
        batches.append(tuple(jnp.asarray(a) for a in args))

    # compile + warmup
    t0 = time.time()
    out = pipe(*batches[0])
    out['diff'].block_until_ready()
    compile_s = time.time() - t0

    iters = 6
    t0 = time.time()
    for i in range(iters):
        out = pipe(*batches[i % 2])
    out['diff'].block_until_ready()
    elapsed = time.time() - t0

    qps = B * iters / elapsed
    baseline = 1.1  # reference quadrants/sec/node (BASELINE.md)
    result = {
        'metric': 'ZTF quadrants/sec/chip, full align+subtract+detect+phot '
                  'chain (3080x3072, A&L 3x3 regions order 4)',
        'value': round(qps, 3),
        'unit': 'quadrants/sec/chip',
        'vs_baseline': round(qps / baseline, 2),
    }
    print(json.dumps(result))
    print(f'# batch={B} iters={iters} elapsed={elapsed:.3f}s '
          f'compile={compile_s:.1f}s device={jax.devices()[0]} '
          f'detections={int(np.asarray(out["det_n"]).sum())}',
          file=sys.stderr)


if __name__ == '__main__':
    main()
