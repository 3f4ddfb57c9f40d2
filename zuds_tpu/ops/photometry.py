"""Aperture photometry on device — the photutils replacement.

Implements what the reference does per-source with photutils
(``zuds/photometry.py:61-113``: SkyCircularAperture r=3 px, 'exact' overlap,
rms-propagated errors, mask-OR flags), but fully batched: every source in a
frame is photometered in one fused program via vmapped fixed-size cutouts.

The circle-pixel overlap weights are analytically exact (closed-form area of
a circle/axis-aligned-rectangle intersection), matching photutils
``method='exact'`` to float precision — required for the sub-mmag parity
budget.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import APERTURE_RADIUS_PX

__all__ = ['circle_pixel_overlap', 'aperture_photometry_batched']


def _quad_area(x, y, r):
    """Area of {u in [0,x], v in [0,y], u^2+v^2 <= r^2} for x,y >= 0."""
    x = jnp.minimum(x, r)
    y = jnp.minimum(y, r)
    # split point where the circle crosses height y
    xc = jnp.sqrt(jnp.maximum(r * r - y * y, 0.0))
    x1 = jnp.minimum(x, xc)          # rectangle part: full height y
    x2 = x                            # beyond xc the circle bounds the area
    def arc_int(t):
        # antiderivative of sqrt(r^2 - u^2)
        t = jnp.clip(t, 0.0, r)
        return 0.5 * (t * jnp.sqrt(jnp.maximum(r * r - t * t, 0.0))
                      + r * r * jnp.arcsin(jnp.clip(t / jnp.maximum(r, 1e-30),
                                                    -1.0, 1.0)))
    rect = y * x1
    arc = jnp.where(x2 > x1, arc_int(x2) - arc_int(x1), 0.0)
    return rect + arc


def circle_pixel_overlap(dx, dy, r):
    """Exact overlap area between the unit pixel centered at (dx, dy) from
    the circle center and a circle of radius ``r``.

    dx, dy may be arrays (broadcast). Equivalent to photutils'
    ``circular_overlap_grid(..., use_exact=1)`` for a single pixel.
    """
    x0, x1 = dx - 0.5, dx + 0.5
    y0, y1 = dy - 0.5, dy + 0.5

    def signed(x, y):
        return (jnp.sign(x) * jnp.sign(y)
                * _quad_area(jnp.abs(x), jnp.abs(y), r))

    return (signed(x1, y1) - signed(x0, y1) - signed(x1, y0)
            + signed(x0, y0))


@partial(jax.jit, static_argnames=('cut', 'r'))
def aperture_photometry_batched(img, rms, mask, xs, ys,
                                r=APERTURE_RADIUS_PX, cut=None):
    """Circular-aperture photometry at (xs, ys) 0-based pixel positions.

    Parameters
    ----------
    img : (H, W) pixel values (background NOT subtracted — matches the
        reference, which photometers the +BKG_VAL science frame and relies
        on aperture-local background behavior; callers choose the frame).
    rms : (H, W) per-pixel sigma, or None.
    mask : (H, W) uint bitmask, or None.
    xs, ys : (N,) float source positions.
    Returns dict of (N,) arrays: flux, fluxerr, area, flags (OR of mask over
    pixels with positive overlap), plus ``oob`` True where the aperture ran
    off the frame.
    """
    H, W = img.shape
    if cut is None:
        cut = 2 * int(np.ceil(r)) + 3
    half = cut // 2
    if rms is None:
        rms = jnp.zeros_like(img)
    if mask is None:
        mask = jnp.zeros(img.shape, dtype=jnp.uint32)
    mask = mask.astype(jnp.uint32)

    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    oob = ((xi - half < 0) | (xi + half >= W)
           | (yi - half < 0) | (yi + half >= H))
    x0 = jnp.clip(xi - half, 0, W - cut)
    y0 = jnp.clip(yi - half, 0, H - cut)

    def one(x0i, y0i, xc, yc):
        sub = jax.lax.dynamic_slice(img, (y0i, x0i), (cut, cut))
        sub_r = jax.lax.dynamic_slice(rms, (y0i, x0i), (cut, cut))
        sub_m = jax.lax.dynamic_slice(mask, (y0i, x0i), (cut, cut))
        yy = y0i + jnp.arange(cut, dtype=jnp.float32)[:, None]
        xx = x0i + jnp.arange(cut, dtype=jnp.float32)[None, :]
        w = circle_pixel_overlap(xx - xc, yy - yc, jnp.float32(r))
        w = jnp.clip(w, 0.0, 1.0)
        flux = jnp.sum(sub * w)
        var = jnp.sum(sub_r * sub_r * w)
        inap = w > 0
        flg = 0
        for bit in range(18):
            has = jnp.any(inap & (((sub_m >> bit) & 1) > 0))
            flg = flg | (has.astype(jnp.int32) << bit)
        return flux, jnp.sqrt(var), jnp.sum(w), flg

    flux, err, area, flags = jax.vmap(one)(x0, y0, xs, ys)
    return {'flux': flux, 'fluxerr': err, 'area': area,
            'flags': flags, 'oob': oob}
