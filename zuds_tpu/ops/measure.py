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

__all__ = ['refine_detections']

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
        return xwin, ywin, rkron, flux, jnp.sqrt(var)

    xw, yw, rk, fa, fe = jax.vmap(one)(
        xi, yi, jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32),
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
        jnp.asarray(theta, jnp.float32), jnp.asarray(fwhm, jnp.float32))
    return {'xwin': xw, 'ywin': yw, 'kron_radius': rk,
            'flux_auto': fa, 'fluxerr_auto': fe}
