"""Refined per-detection measurements: windowed centroids + Kron photometry.

Fills the two measurement gaps vs SExtractor's catalog columns
(``zuds/astromatic/sextractor.param``): XWIN/YWIN_IMAGE (iterative
Gaussian-weighted windowed centroids) and FLUX_AUTO/FLUXERR_AUTO (Kron
elliptical-aperture photometry with the reference's PHOT_AUTOPARAMS 2.5,
3.5). Batched: one vmapped fixed-size-cutout program measures every
detection in a frame.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ['refine_detections', 'select_stamps_device',
           'seeing_from_stamps']


@partial(jax.jit, static_argnames=('smax', 'nreg', 'margin'))
def select_stamps_device(img, smax=384, nreg=3, sat_level=5e3, margin=32):
    """Kernel-fit star-stamp selection on device, no catalog required.

    hotpants selects substamps by scanning for bright unsaturated local
    maxima (its own ssig/ks thresholds), not by running SExtractor — this
    is the equivalent device op for the batched night driver: 9x9 local
    maxima of the 3x3-filtered frame, above med + 10 sigma, below
    ``sat_level``, split evenly across the nreg x nreg kernel regions
    (hotpants fills its region grid the same way; zuds/hotpants.py:46-47).
    Returns (xs, ys, valid) fixed-size (smax,) arrays.
    """
    from .background import bisect_median
    from .convolve import conv2_same, DEFAULT_FILTER
    H, W = img.shape
    filt = conv2_same(img, DEFAULT_FILTER)

    flat1 = img.ravel()[None, :]
    ok1 = jnp.ones_like(flat1, dtype=bool)
    med = bisect_median(flat1, ok1)[0]
    mad = bisect_median(jnp.abs(img - med).ravel()[None, :], ok1)[0]
    sigma = 1.4826 * mad

    # 9x9 local max via 4 shifted-max sweeps (separable log-doubling)
    def shift_max(a, k, axis):
        lo = jnp.full_like(a, -jnp.inf)
        if axis == 0:
            up = jnp.concatenate([a[k:], lo[:k]], axis=0)
            dn = jnp.concatenate([lo[-k:], a[:-k]], axis=0)
        else:
            up = jnp.concatenate([a[:, k:], lo[:, :k]], axis=1)
            dn = jnp.concatenate([lo[:, -k:], a[:, :-k]], axis=1)
        return jnp.maximum(a, jnp.maximum(up, dn))

    mx = filt
    for k in (1, 2, 1):
        mx = shift_max(shift_max(mx, k, 0), k, 1)

    yy = jnp.arange(H, dtype=jnp.int32)[:, None]
    xx = jnp.arange(W, dtype=jnp.int32)[None, :]
    cand = ((filt >= mx) & (filt > med + 10.0 * sigma)
            & (img < sat_level)
            & (xx >= margin) & (xx < W - margin)
            & (yy >= margin) & (yy < H - margin))

    cap = 4096
    nc = jnp.sum(cand.ravel().astype(jnp.int32))
    from .detect import compact_indices
    cidx = compact_indices(cand.ravel(), cap, 0)
    cok = jnp.arange(cap) < jnp.minimum(nc, cap)
    cx = (cidx % W).astype(jnp.int32)
    cy = (cidx // W).astype(jnp.int32)
    cf = jnp.where(cok, filt.ravel()[cidx], -jnp.inf)

    R2 = nreg * nreg
    per = smax // R2
    rx = jnp.clip(cx * nreg // W, 0, nreg - 1)
    ry = jnp.clip(cy * nreg // H, 0, nreg - 1)
    rid = ry * nreg + rx
    xs_parts, ys_parts, ok_parts = [], [], []
    for r in range(R2):
        fr = jnp.where(rid == r, cf, -jnp.inf)
        top, ti = jax.lax.top_k(fr, per)
        xs_parts.append(cx[ti].astype(jnp.float32))
        ys_parts.append(cy[ti].astype(jnp.float32))
        ok_parts.append(jnp.isfinite(top))
    xs = jnp.concatenate(xs_parts)
    ys = jnp.concatenate(ys_parts)
    valid = jnp.concatenate(ok_parts)
    pad = smax - R2 * per
    if pad:
        xs = jnp.concatenate([xs, jnp.zeros(pad, jnp.float32)])
        ys = jnp.concatenate([ys, jnp.zeros(pad, jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return xs, ys, valid


@partial(jax.jit, static_argnames=('cut', 'nuse'))
def seeing_from_stamps(img, xs, ys, valid, cut=25, nuse=64):
    """Median FWHM over star stamps — the SEEING fallback when no Gaia
    match is available (reference estimate_seeing medians FWHM_IMAGE of
    catalog stars, zuds/seeing.py:110-118).
    """
    H, W = img.shape
    half = cut // 2
    xs = xs[:nuse]
    ys = ys[:nuse]
    valid = valid[:nuse]
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32) - half, 0, W - cut)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32) - half, 0, H - cut)

    def one(x0, y0):
        sub = jax.lax.dynamic_slice(img, (y0, x0), (cut, cut))
        # local background from the stamp border median-ish (mean of edges)
        edge = (jnp.sum(sub[0]) + jnp.sum(sub[-1])
                + jnp.sum(sub[:, 0]) + jnp.sum(sub[:, -1])) / (4 * cut)
        pos = jnp.maximum(sub - edge, 0.0)
        yy = jnp.arange(cut, dtype=jnp.float32)[:, None]
        xx = jnp.arange(cut, dtype=jnp.float32)[None, :]
        tot = jnp.maximum(jnp.sum(pos), 1e-20)
        cx = jnp.sum(pos * xx) / tot
        cy = jnp.sum(pos * yy) / tot
        x2 = jnp.sum(pos * (xx - cx) ** 2) / tot
        y2 = jnp.sum(pos * (yy - cy) ** 2) / tot
        return 2.0 * jnp.sqrt(jnp.log(2.0) * (x2 + y2))

    fw = jax.vmap(one)(xi, yi)
    fw = jnp.where(valid, fw, jnp.nan)
    med = jnp.nanmedian(fw)
    return jnp.nan_to_num(med, nan=2.0)

KRON_FACT = 2.5          # PHOT_AUTOPARAMS[0]
KRON_MIN_RADIUS = 3.5    # PHOT_AUTOPARAMS[1]
KRON_INT_RADIUS = 6.0    # integration ellipse for the Kron radius moment


@partial(jax.jit, static_argnames=('cut',))
def refine_detections(img, rms, xs, ys, a, b, theta, fwhm, cut=33):
    """Windowed centroids + Kron AUTO photometry at detections.

    Parameters
    ----------
    img : (H, W) background-subtracted frame.
    rms : (H, W) noise map.
    xs, ys : (N,) isophotal centroids (0-based).
    a, b, theta : (N,) shape parameters (px, px, radians).
    fwhm : (N,) FWHM estimates (px) — sets the windowed-centroid scale.
    Returns dict of (N,) arrays: xwin, ywin, kron_radius, flux_auto,
    fluxerr_auto.
    """
    H, W = img.shape
    half = cut // 2
    xi = jnp.clip(jnp.round(xs).astype(jnp.int32) - half, 0, W - cut)
    yi = jnp.clip(jnp.round(ys).astype(jnp.int32) - half, 0, H - cut)

    def one(x0, y0, xc, yc, ai, bi, th, fw):
        sub = jax.lax.dynamic_slice(img, (y0, x0), (cut, cut))
        sub_r = jax.lax.dynamic_slice(rms, (y0, x0), (cut, cut))
        yy = y0 + jnp.arange(cut, dtype=jnp.float32)[:, None]
        xx = x0 + jnp.arange(cut, dtype=jnp.float32)[None, :]
        pos = jnp.maximum(sub, 0.0)

        # --- windowed centroid: iterative Gaussian-weighted first moment
        # (SExtractor XWIN: s_win = FWHM/2.35 * 2/2.35... uses
        # s = HWHM-based window; we follow the standard s = 2*sigma_psf)
        swin = jnp.maximum(fw / 2.355 * 2.0, 1.0)

        def witer(_, c):
            cx, cy = c
            w = jnp.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                        / (2 * swin * swin)) * pos
            tot = jnp.maximum(jnp.sum(w), 1e-20)
            return (jnp.sum(w * xx) / tot, jnp.sum(w * yy) / tot)

        xwin, ywin = jax.lax.fori_loop(0, 4, witer, (xc, yc))

        # --- windowed second moments + positional uncertainties
        # (sextractor.param ERRAWIN/ERRBWIN/ERRTHETAWIN; the reference's
        # SCAMP weights its astrometric fit with these). With window g and
        # weights wI = g * I:  x2win = sum wI (x-xw)^2 / sum wI;  the noise
        # propagation of the windowed centroid xw = sum wI x / sum wI is
        # d(xw)/dI_i = g_i (x_i - xw) / sum wI, so
        # errx2win = sum g^2 sigma^2 (x-xw)^2 / (sum wI)^2.
        g = jnp.exp(-((xx - xwin) ** 2 + (yy - ywin) ** 2)
                    / (2 * swin * swin))
        wI = g * pos
        wsum = jnp.maximum(jnp.sum(wI), 1e-20)
        dxw = xx - xwin
        dyw = yy - ywin
        x2w = jnp.sum(wI * dxw * dxw) / wsum
        y2w = jnp.sum(wI * dyw * dyw) / wsum
        xyw = jnp.sum(wI * dxw * dyw) / wsum
        x2w = jnp.maximum(x2w, 1.0 / 12.0)
        y2w = jnp.maximum(y2w, 1.0 / 12.0)
        t1w = (x2w + y2w) / 2.0
        t2w = jnp.sqrt(jnp.maximum(((x2w - y2w) / 2.0) ** 2 + xyw * xyw,
                                   0.0))
        awin = jnp.sqrt(jnp.maximum(t1w + t2w, 1e-12))
        bwin = jnp.sqrt(jnp.maximum(t1w - t2w, 1e-12))
        thetawin = 0.5 * jnp.arctan2(2.0 * xyw, x2w - y2w)
        g2v = g * g * sub_r * sub_r
        ex2 = jnp.sum(g2v * dxw * dxw) / (wsum * wsum)
        ey2 = jnp.sum(g2v * dyw * dyw) / (wsum * wsum)
        exy = jnp.sum(g2v * dxw * dyw) / (wsum * wsum)
        et1 = (ex2 + ey2) / 2.0
        et2 = jnp.sqrt(jnp.maximum(((ex2 - ey2) / 2.0) ** 2 + exy * exy,
                                   0.0))
        errawin = jnp.sqrt(jnp.maximum(et1 + et2, 1e-20))
        errbwin = jnp.sqrt(jnp.maximum(et1 - et2, 1e-20))
        errthetawin = 0.5 * jnp.arctan2(2.0 * exy, ex2 - ey2)

        # --- Kron radius: first moment of |r_ell| inside the integration
        # ellipse of KRON_INT_RADIUS (SExtractor's R^2 ~ 6 ellipse)
        ct, st = jnp.cos(th), jnp.sin(th)
        dx = xx - xwin
        dy = yy - ywin
        xr = dx * ct + dy * st
        yr = -dx * st + dy * ct
        ai_s = jnp.maximum(ai, 0.5)
        bi_s = jnp.maximum(bi, 0.5)
        r_ell = jnp.sqrt((xr / ai_s) ** 2 + (yr / bi_s) ** 2)
        inside = r_ell <= KRON_INT_RADIUS
        wflux = jnp.where(inside, pos, 0.0)
        denom = jnp.maximum(jnp.sum(wflux), 1e-20)
        rkron = jnp.sum(wflux * r_ell) / denom
        rkron = jnp.maximum(rkron, KRON_MIN_RADIUS / KRON_FACT / ai_s)

        # --- AUTO flux: sum inside the ellipse scaled by KRON_FACT*rkron
        rk = KRON_FACT * rkron
        ap = (r_ell <= rk).astype(sub.dtype)
        flux = jnp.sum(sub * ap)
        var = jnp.sum(sub_r * sub_r * ap)
        return (xwin, ywin, rkron, flux, jnp.sqrt(var),
                awin, bwin, thetawin, errawin, errbwin, errthetawin)

    (xw, yw, rk, fa, fe, aw, bw, tw, eaw, ebw, etw) = jax.vmap(one)(
        xi, yi, jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(theta, jnp.float32), jnp.asarray(fwhm, jnp.float32))
    return {'xwin': xw, 'ywin': yw, 'kron_radius': rk,
            'flux_auto': fa, 'fluxerr_auto': fe,
            'awin': aw, 'bwin': bw, 'thetawin': tw,
            'errawin': eaw, 'errbwin': ebw, 'errthetawin': etw}
