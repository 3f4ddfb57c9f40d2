"""Pallas TPU kernel: tiled aligned Lanczos-3 image warp.

Same math as ``resample.warp_shift_image`` (the SWarp-align replacement;
``zuds/swarp.py:107-154``) — a shift-accumulate Lanczos-3 interpolation
valid for |u-x|, |v-y| <= window — but executed per (64, 256) tile
entirely in VMEM: each tile's input strip is DMA'd from HBM exactly
once, the 15 column rotations are materialized once per tile, and the
225 tap FMAs accumulate in vector registers with weights from the
Lanczos angle-addition identity (4 transcendental fields per tile).

Status (docs/PERF.md round 3): measures 66 ms/quadrant — parity with the
XLA shift-accumulate form, not faster — so the XLA form ships; this
kernel is the starting point if the warp budget must shrink further.
The r2 8-row strip variant (180 ms, per-statement scratch accumulation)
and the fused image+mask variant (obsoleted by the separable
``warp_shift_mask``) were deleted; findings live in docs/PERF.md.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resample import (SUPPORT, _tap_weight_consts, _tap_phases,
                       _tap_weight)

__all__ = ['warp_tiled_pallas']


def _warp_tile_kernel(u_ref, v_ref, imgp_ref, out_ref, cov_ref,
                      img_s, cs_s, wx_s, wsum_s, acc_s, wacc_s, sems,
                      *, TH, TW, P, Q, CPAD, W, H, window):
    """One (TH, TW) output tile of the shift-accumulate Lanczos-3 warp.

    Layout discipline (the r2 kernel's lesson, docs/PERF.md): the 225 tap
    reads must not each pay a lane (128-wide) relayout. The 15 column
    rotations are materialized ONCE per tile into ``cs_s``; the per-tap
    row offsets are then sublane-only slices (cheap register shuffles).
    Weights use the Lanczos angle-addition identity: 4 transcendental
    fields per tile serve all 225 taps.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    cp = pltpu.make_async_copy(
        imgp_ref.at[pl.ds(i * TH, TH + 2 * Q), pl.ds(j * TW, TW + CPAD)],
        img_s, sems)
    cp.start()

    u = u_ref[:, :]
    v = v_ref[:, :]
    ly = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0).astype(jnp.float32)
    lx = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1).astype(jnp.float32)
    du = u - (lx + (j * TW).astype(jnp.float32))
    dv = v - (ly + (i * TH).astype(jnp.float32))

    lo = -P
    ntap = 2 * P + 1
    a_j, b_j = _tap_weight_consts(lo, P)
    Au, Bu = _tap_phases(du)
    Av, Bv = _tap_phases(dv)
    # weights live in scratch (ntap values would hold ~240 vregs); the
    # ACCUMULATORS live in vregs as python-level values — accumulating
    # into a scratch ref costs a VMEM read+write round-trip per tap
    # statement (measured 70 ms/quadrant; value-based accumulation is the
    # difference between per-statement memory traffic and register FMAs)
    wsum = jnp.zeros((TH, TW), jnp.float32)
    for t in range(ntap):
        wxt = _tap_weight(Au, Bu, du, float(lo + t), a_j[t], b_j[t])
        wx_s[t] = wxt
        wsum = wsum + wxt

    cp.wait()

    # 15 one-time lane rotations; CPAD//2 is the in-strip column of the
    # tile's first output pixel's dx=0 tap
    base = CPAD // 2 - P
    for t in range(ntap):
        cs_s[t] = img_s[:, base + t: base + t + TW]

    acc = jnp.zeros((TH, TW), jnp.float32)
    wacc = jnp.zeros((TH, TW), jnp.float32)
    for dy in range(-P, P + 1):
        wy = _tap_weight(Av, Bv, dv, float(dy), a_j[dy + P], b_j[dy + P])
        rs = Q + dy
        for t in range(ntap):
            acc = acc + cs_s[t, rs:rs + TH, :] * (wx_s[t] * wy)
        wacc = wacc + wsum * wy

    inb = ((u >= SUPPORT - 1) & (u <= W - SUPPORT)
           & (v >= SUPPORT - 1) & (v <= H - SUPPORT))
    out = acc / jnp.where(wacc == 0.0, 1.0, wacc)
    covf = inb.astype(jnp.float32)
    out_ref[:, :] = out * covf
    cov_ref[:, :] = covf


@partial(jax.jit, static_argnames=('window', 'interpret'))
def warp_tiled_pallas(img, u, v, window=4, interpret=False):
    """Tiled Mosaic shift-accumulate Lanczos-3 warp: (warped, coverage).

    Drop-in equivalent of ``resample.warp_shift_image`` (same math, same
    coverage rule). Each (64, 256) output tile reads its input strip from
    HBM exactly once; the XLA form streams ~20 GB of HBM traffic per
    quadrant through the 225 shifted multiply-adds (65 ms measured r2).
    """
    H, W = img.shape
    P = window + SUPPORT
    Q = -(-P // 8) * 8
    TH, TW = 64, 256
    CPAD = 128 * (-(-(2 * P) // 128) + 1)   # lane-aligned col halo (>=2P)
    nh = -(-H // TH)
    nw = -(-W // TW)
    Hp, Wp = nh * TH, nw * TW

    imgp = jnp.pad(img.astype(jnp.float32),
                   ((Q, Hp - H + Q), (CPAD // 2, Wp - W + CPAD // 2)))
    up = jnp.pad(u.astype(jnp.float32), ((0, Hp - H), (0, Wp - W)))
    vp = jnp.pad(v.astype(jnp.float32), ((0, Hp - H), (0, Wp - W)))

    ntap = 2 * P + 1
    kern = partial(_warp_tile_kernel, TH=TH, TW=TW, P=P, Q=Q, CPAD=CPAD,
                   W=W, H=H, window=window)
    out, cov = pl.pallas_call(
        kern,
        grid=(nh, nw),
        in_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * Q, TW + CPAD), jnp.float32),
            pltpu.VMEM((ntap, TH + 2 * Q, TW), jnp.float32),
            pltpu.VMEM((ntap, TH, TW), jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.VMEM((TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(ntap * ntap * 3 * H * W),
            bytes_accessed=int(6 * H * W * 4),
            transcendentals=int(6 * H * W),
        ),
        interpret=interpret,
    )(up, vp, imgp)
    return out[:H, :W], cov[:H, :W]
