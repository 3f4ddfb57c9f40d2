"""A/B the FULL fused pipeline across PipelineConfig overrides (TPU).

Only whole-program numbers are comparable across changes (docs/PERF.md);
this times the complete subtract+detect+phot program per config variant.
Usage: python tools/bench_ab.py [iters] key=val[,key=val...] ...
e.g.   python tools/bench_ab.py 6 sep_warp=True sep_warp=False
"""
import ast
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    import jax
    import jax.numpy as jnp
    from zuds_tpu.parallel import PipelineConfig
    from zuds_tpu.parallel.pipeline import make_subtract_detect_pipeline
    from __graft_entry__ import _synth_inputs

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    variants = sys.argv[2:] or ['sep_warp=True', 'sep_warp=False']
    H, W = 3080, 3072
    base = dict(height=H, width=W, ksize=15, stamp=41, smax=384,
                order=4, nreg=3, max_det=1024)
    args0 = _synth_inputs(1, H, W, PipelineConfig(**base), seed=0)
    argsj = [jnp.asarray(a) for a in args0]

    for spec in variants:
        over = {}
        for kv in spec.split(','):
            k, v = kv.split('=')
            over[k] = ast.literal_eval(v)
        cfg = PipelineConfig(**{**base, **over})
        pipe = make_subtract_detect_pipeline(cfg)
        t0 = time.time()
        out = pipe(*argsj)
        jax.block_until_ready(out)
        comp = time.time() - t0
        # variant-unique perturbations: the axon request cache can serve
        # previously-seen calls when inputs repeat across variants
        # (tools/bench_nonzero.py r3 postmortem)
        voff = (abs(hash(spec)) % 997 + 1) * 1e-4
        t0 = time.time()
        for i in range(iters):
            out = pipe(argsj[0] + (voff + (i + 1) * 1e-3), *argsj[1:])
        jax.block_until_ready(out)
        per = (time.time() - t0) / iters
        nd = (int(np.asarray(out['det_n']).sum())
              if 'det_n' in out else -1)
        print(f'{spec:40s} {per * 1e3:9.2f} ms/frame '
              f'({1.0 / per:5.2f} q/s, compile {comp:.0f}s, '
              f'ndet={nd})', flush=True)


if __name__ == '__main__':
    main()
