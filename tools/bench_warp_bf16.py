"""A/B the shift-accumulate warp: f32 pixels vs bf16 pixels + f32 accum.

The warp is pure HBM streaming (docs/PERF.md): per scan step it re-reads
the rolled image row-slab and the hoisted wx stack. Storing both in
bfloat16 halves that traffic; accumulators stay f32. Parity: Lanczos taps
sum to ~1, pixel values are O(1e4) — bf16's 8-bit mantissa costs ~0.4%
per-pixel, which the A&L fit's stamp sums average down; the oracle suite
must still pass before this ships as a default.

Usage: python tools/bench_warp_bf16.py [window] [iters]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_warp(dtype_px):
    import jax
    import jax.numpy as jnp
    from zuds_tpu.ops.resample import lanczos3, SUPPORT

    def warp(img, u, v, window=2):
        H, W = img.shape
        yy = jnp.arange(H, dtype=u.dtype)[:, None]
        xx = jnp.arange(W, dtype=u.dtype)[None, :]
        du = u - xx
        dv = v - yy
        inb = ((u >= SUPPORT - 1) & (u <= W - SUPPORT)
               & (v >= SUPPORT - 1) & (v <= H - SUPPORT))
        lo = -(window + SUPPORT)
        hi = window + SUPPORT
        img_t = img.astype(dtype_px)
        wx = jnp.stack([lanczos3(du - dx).astype(dtype_px)
                        for dx in range(lo, hi + 1)])
        wxsum = jnp.sum(wx.astype(jnp.float32), axis=0)
        dys = jnp.arange(lo, hi + 1)

        def row_taps(carry, dy):
            acc, wacc = carry
            wy = lanczos3(dv - dy)
            wy_t = wy.astype(dtype_px)
            simg_row = jnp.roll(img_t, -dy, axis=0)
            for j, dx in enumerate(range(lo, hi + 1)):
                acc = acc + (jnp.roll(simg_row, -dx, axis=1)
                             * (wx[j] * wy_t)).astype(jnp.float32)
            wacc = wacc + wxsum * wy
            return (acc, wacc), None

        init = (jnp.zeros(img.shape, jnp.float32),
                jnp.zeros(img.shape, jnp.float32))
        (acc, wacc), _ = jax.lax.scan(row_taps, init, dys)
        out = acc / jnp.where(wacc == 0, 1.0, wacc)
        cov = inb.astype(jnp.float32)
        return out * cov, cov

    return warp


def main():
    import jax
    import jax.numpy as jnp

    window = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    H, W = 3080, 3072
    rng = np.random.default_rng(0)
    img = rng.normal(150.0, 6.0, (H, W)).astype('f4')
    img[::37, ::53] += 5000.0
    yy, xx = np.mgrid[0:H, 0:W].astype('f4')
    u = (xx + 1.3 + 0.4 * np.sin(yy / 700.0)).astype('f4')
    v = (yy - 0.7 + 0.3 * np.cos(xx / 600.0)).astype('f4')
    uj, vj = jnp.asarray(u), jnp.asarray(v)

    ref = None
    for name, dt in [('f32', jnp.float32), ('bf16', jnp.bfloat16)]:
        warp = jax.jit(make_warp(dt), static_argnames='window')
        imj = jnp.asarray(img)
        t0 = time.time()
        out, cov = warp(imj, uj, vj, window=window)
        out.block_until_ready()
        comp = time.time() - t0
        # chained distinct inputs, one final sync (axon request cache)
        t0 = time.time()
        o = imj
        for i in range(iters):
            o, _ = warp(o + np.float32(i) * 1e-3, uj, vj, window=window)
        o.block_until_ready()
        per = (time.time() - t0) / iters
        a = np.asarray(out)
        if ref is None:
            ref = a
            err = 0.0
        else:
            sel = np.asarray(cov) > 0
            err = np.max(np.abs(a[sel] - ref[sel])
                         / np.maximum(np.abs(ref[sel]), 1.0))
        print(f'{name}: {per * 1e3:8.2f} ms/frame (compile {comp:.0f}s, '
              f'max rel err vs f32 {err:.2e})', flush=True)


if __name__ == '__main__':
    main()
