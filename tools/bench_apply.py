"""Microbench: A&L model-convolution (apply) formulations on the real TPU.

The shipping apply (grouped separable 1-D convs over the 49-fn basis)
measures 76.5 ms/quadrant; every dense-MXU XLA rewrite tried in r2/r3 was
catastrophically slower (docs/PERF.md). This explores the two formulations
those rounds missed:

  s2d    space-to-depth: pack the frame (H, W) -> (H/8, W/8, 64), fold the
         49-basis x 15-term kernel field into 16 dense per-term kernels
         K_m = sum_n a[n,m] B_n (15x15), and run the conv as a 3x3x64->1024
         NHWC conv (or 9 shifted matmuls) — C_in=64/C_out=1024 is the
         CNN shape XLA's TPU conv emitter is actually good at; the term
         blend sum_m P_m(x,y) conv_m happens on the depth axis.
  mm     Pallas: same packing, 9 explicit MXU matmuls per tile.

All timings: chained distinct inputs inside one jitted lax.scan (axon
request cache + tunnel RTT; see CLAUDE.md). Usage:
    python tools/bench_apply.py [iters] [form ...]
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

H, W = 3080, 3072
D = 8                     # space-to-depth factor
KS = 15                   # kernel size
NM = 16                   # spatial terms (order 4 -> 15, padded to 16)


def timed(fn, x0, iters, *extras):
    """Time fn(x, *extras) chained over distinct inputs. ``extras`` are
    passed as jit ARGUMENTS (a closure-captured device constant gets
    embedded into the HLO and shipped to the remote compile helper —
    a 605 MB constant bounced with HTTP 413)."""
    import jax
    import jax.numpy as jnp

    def run_fn(x, *ex):
        def body(c, i):
            s = fn(c, *ex)
            return x0 + (s * 1e-20 + i * 1e-6), None
        return jax.lax.scan(body, x,
                            jnp.arange(iters, dtype=jnp.float32))[0]

    run = jax.jit(run_fn)
    t0 = time.time()
    run(x0, *extras).block_until_ready()
    comp = time.time() - t0
    t0 = time.time()
    run(x0 + 1.0, *extras).block_until_ready()
    return (time.time() - t0) / iters, comp


def s2d(img, d=D):
    """(H, W) -> (H/d, W/d, d*d), Z[Y,X,cy*d+cx] = img[Y*d+cy, X*d+cx]."""
    import jax.numpy as jnp
    Hh, Ww = img.shape
    z = img.reshape(Hh // d, d, Ww // d, d)
    return jnp.transpose(z, (0, 2, 1, 3)).reshape(Hh // d, Ww // d, d * d)


def inv_s2d(z, d=D):
    import jax.numpy as jnp
    HY, WX, _ = z.shape
    z = z.reshape(HY, WX, d, d)
    return jnp.transpose(z, (0, 2, 1, 3)).reshape(HY * d, WX * d)


def make_wbig(kd, d=D, ks=KS):
    """Fold dense per-term kernels (Nm, ks, ks) into the s2d conv weight
    (3, 3, d*d, d*d*Nm):  out_Z[Y,X,co*Nm+m] = sum_{dY,dX,ci}
    Z[Y+dY-1, X+dX-1, ci] * Wbig[dY,dX,ci,co*Nm+m]  equals the 'same' conv
    of img with K_m evaluated at pixel (Y*d+cyo, X*d+cxo)."""
    nm = kd.shape[0]
    r = ks // 2
    wb = np.zeros((3, 3, d * d, d * d * nm), np.float32)
    for cyo in range(d):
        for cxo in range(d):
            co = cyo * d + cxo
            for ky in range(ks):
                for kx in range(ks):
                    # input pixel = out + (ky - r, kx - r)
                    iy, ix = cyo + ky - r, cxo + kx - r
                    dY, dX = iy // d + 1, ix // d + 1
                    ci = (iy % d) * d + (ix % d)
                    wb[dY, dX, ci, co * nm:(co + 1) * nm] = kd[:, ky, kx]
    return wb


def main():
    import jax
    import jax.numpy as jnp

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    forms = sys.argv[2:] or ['base', 's2d_f32', 's2d_bf16', 's2d_hilo',
                             'mm_hilo']

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(150.0, 5.0, (H, W)).astype('f4'))
    kd_np = rng.normal(0, 0.05, (NM, KS, KS)).astype('f4')
    kd_np[0, KS // 2, KS // 2] += 1.0
    kd = jnp.asarray(kd_np)
    wb_np = make_wbig(kd_np)
    wb = jnp.asarray(wb_np)
    # per-term blend fields P_m on the s2d grid: (HY, WX, dd, NM) folded
    # as (HY, WX, dd*NM) to match the conv output layout
    yy = np.arange(H, dtype=np.float32)[:, None] / H - 0.5
    xx = np.arange(W, dtype=np.float32)[None, :] / W - 0.5
    terms = []
    k = 0
    for o in range(5):
        for p in range(o + 1):
            q = o - p
            terms.append((xx ** p) * (yy ** q))
            k += 1
    while len(terms) < NM:
        terms.append(np.zeros((H, W), np.float32))
    P = np.stack(terms, -1)                                   # (H, W, NM)
    PZ = P.reshape(H // D, D, W // D, D, NM).transpose(0, 2, 1, 3, 4)
    PZ = jnp.asarray(PZ.reshape(H // D, W // D, D * D * NM))

    if 'base' in forms or 'real' in forms or 'real_hi' in forms:
        from zuds_tpu.ops.subtract import (KernelBasis, apply_kernel,
                                           apply_kernel_s2d, spatial_terms)
        basis = KernelBasis(KS, seeing_sigma=2.0)
        nbm = basis.nbasis * len(spatial_terms(4)) + 1
        coeffs = jnp.asarray(rng.normal(0, 0.01, (9, nbm)).astype('f4'))

    if 'base' in forms:
        def base(x):
            m = apply_kernel(x, coeffs, basis.gx, basis.gy, basis.sums,
                             jnp.asarray(basis.b0_2d), order=4, nreg=3)
            return jnp.sum(m[::997, ::991])
        per, comp = timed(base, img, iters)
        print(f'base grouped-conv apply : {per*1e3:8.2f} ms '
              f'(compile {comp:.0f}s)', flush=True)

    for nm_, md_ in (('real', 'hilo'), ('real_hi', 'highest')):
        if nm_ not in forms:
            continue

        def realf(x, _m=md_):
            m = apply_kernel_s2d(x, coeffs, basis.gx, basis.gy, basis.sums,
                                 jnp.asarray(basis.b0_2d), order=4, nreg=3,
                                 mode=_m)
            return jnp.sum(m[::997, ::991])
        per, comp = timed(realf, img, iters)
        print(f'apply_kernel_s2d {md_:7s}: {per*1e3:8.2f} ms '
              f'(compile {comp:.0f}s)', flush=True)

    def s2d_conv(x, w, pz, prec):
        z = s2d(x)[None]                                      # (1,HY,WX,64)
        out = jax.lax.conv_general_dilated(
            z, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            precision=prec)[0]                                # (HY,WX,1024)
        blended = out * pz                                    # fold P_m
        bl = blended.reshape(H // D, W // D, D * D, NM).sum(-1)
        return inv_s2d(bl)

    if 's2d_f32' in forms:
        f = lambda x, w, pz: jnp.sum(
            s2d_conv(x, w, pz, jax.lax.Precision.HIGHEST)[::997, ::991])
        per, comp = timed(f, img, iters, wb, PZ)
        print(f's2d conv f32 HIGHEST    : {per*1e3:8.2f} ms '
              f'(compile {comp:.0f}s)', flush=True)

    if 's2d_bf16' in forms:
        wbh = wb.astype(jnp.bfloat16)

        def f(x, w, pz):
            z = s2d(x)[None].astype(jnp.bfloat16)
            out = jax.lax.conv_general_dilated(
                z, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)[0]
            bl = (out * pz).reshape(H // D, W // D, D * D, NM).sum(-1)
            return jnp.sum(inv_s2d(bl)[::997, ::991])
        per, comp = timed(f, img, iters, wbh, PZ)
        print(f's2d conv bf16           : {per*1e3:8.2f} ms '
              f'(compile {comp:.0f}s)', flush=True)

    if 's2d_hilo' in forms:
        # f32-equivalent via bf16 hi/lo split on BOTH operands (3 convs)
        wh = wb.astype(jnp.bfloat16)
        wl = (wb - wh.astype(jnp.float32)).astype(jnp.bfloat16)

        def f(x, wh_, wl_, pz):
            z = s2d(x)[None]
            zh = z.astype(jnp.bfloat16)
            zl = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)

            def cv(a, w):
                return jax.lax.conv_general_dilated(
                    a, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.float32)
            out = (cv(zh, wh_) + cv(zh, wl_) + cv(zl, wh_))[0]
            bl = (out * pz).reshape(H // D, W // D, D * D, NM).sum(-1)
            return jnp.sum(inv_s2d(bl)[::997, ::991])
        per, comp = timed(f, img, iters, wh, wl, PZ)
        print(f's2d conv bf16 hi/lo x3  : {per*1e3:8.2f} ms '
              f'(compile {comp:.0f}s)', flush=True)

    if 'mm_hilo' in forms or 'mm_bf16' in forms:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        HY, WX, CC = H // D, W // D, D * D
        NOUT = CC * NM
        TY = 8                                  # Z-rows per tile

        def mm_kernel(z_ref, wh_ref, wl_ref, pz_ref, out_ref, *, hilo):
            # z_ref: (TY+2, WX+2pad, 64) f32; compute 9 matmul-accumulates
            acc = jnp.zeros((TY * WX, NOUT), jnp.float32)
            for dY in range(3):
                for dX in range(3):
                    zblk = z_ref[dY:dY + TY, dX:dX + WX, :]
                    zf = zblk.reshape(TY * WX, CC)
                    zh = zf.astype(jnp.bfloat16)
                    wdy = wh_ref[dY, dX]
                    acc = acc + jnp.dot(zh, wdy,
                                        preferred_element_type=jnp.float32)
                    if hilo:
                        zl = (zf - zh.astype(jnp.float32)
                              ).astype(jnp.bfloat16)
                        acc = (acc
                               + jnp.dot(zh, wl_ref[dY, dX],
                                         preferred_element_type=jnp.float32)
                               + jnp.dot(zl, wdy,
                                         preferred_element_type=jnp.float32))
            blended = acc.reshape(TY * WX, CC, NM) * pz_ref[:].reshape(
                TY * WX, CC, NM)
            out_ref[:] = blended.sum(-1).reshape(TY, WX, CC)

        wh_np = wb_np.astype(jnp.bfloat16)
        wl_np = (wb_np - np.asarray(wh_np, np.float32)).astype(jnp.bfloat16)
        whj = jnp.asarray(wh_np)
        wlj = jnp.asarray(wl_np)

        def mm_form(x, hilo, whj, wlj, PZ):
            z = s2d(x)
            zp = jnp.pad(z, ((1, 1), (1, 1), (0, 0)))
            grid = (HY // TY + (1 if HY % TY else 0),)
            # pad HY to TY multiple
            HYp = grid[0] * TY
            zp = jnp.pad(zp, ((0, HYp - HY), (0, 0), (0, 0)))
            pzp = jnp.pad(PZ, ((0, HYp - HY), (0, 0), (0, 0)))
            out = pl.pallas_call(
                partial(mm_kernel, hilo=hilo),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((TY + 2, WX + 2, CC),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((TY, WX, CC * NM), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TY, WX, CC), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((HYp, WX, CC), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
                cost_estimate=pl.CostEstimate(
                    flops=int(2 * 9 * HY * WX * CC * NOUT
                              * (3 if hilo else 1)),
                    bytes_accessed=int(HY * WX * CC * 8),
                    transcendentals=0),
            )(zp, whj, wlj, pzp)
            return inv_s2d(out[:HY])

        if 'mm_bf16' in forms or 'mm_hilo' in forms:
            for name, hl in (('mm_bf16', False), ('mm_hilo', True)):
                if name not in forms:
                    continue
                f = lambda x, wh_, wl_, pz, _hl=hl: jnp.sum(
                    mm_form(x, _hl, wh_, wl_, pz)[::997, ::991])
                per, comp = timed(f, img, iters, whj, wlj, PZ)
                print(f'pallas 9-matmul {name:8s}: {per*1e3:8.2f} ms '
                      f'(compile {comp:.0f}s)', flush=True)

    # numeric check: s2d_hilo vs a direct f64-ish XLA reference on a crop
    if 'check' not in forms:
        return
    crop = 512
    sub = img[:crop, :crop]
    ref = np.zeros((crop, crop), np.float32)
    subn = np.asarray(sub, np.float64)
    pn = P[:crop, :crop]
    kdn = np.asarray(kd_np, np.float64)
    padded = np.pad(subn, KS // 2)
    # direct conv (slow, host): sum_m P_m * (img (*) K_m)
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(padded, (KS, KS))               # (crop,crop,15,15)
    conv = np.einsum('xykl,mkl->xym', win, kdn[:, ::-1, ::-1]
                     if False else kdn)
    ref = (conv * pn[:, :, :NM]).sum(-1)
    zc = s2d(jnp.asarray(np.pad(np.asarray(sub), ((0, 0), (0, 0)))))
    # reuse full-frame path on the crop via padding to full frame
    test = np.asarray(s2d_conv(jnp.asarray(np.pad(
        np.asarray(img), ((0, 0), (0, 0)))), wb, PZ,
        jax.lax.Precision.HIGHEST))[:crop, :crop]
    err = np.max(np.abs(test - ref) / (np.abs(ref) + 1.0))
    print(f'numeric check s2d_f32 vs host direct: max rel err {err:.2e}')


if __name__ == '__main__':
    main()
