"""Astrometric refinement (reference: zuds/scamp.py).

The reference forks SCAMP to fit degree-3 TPV solutions against GAIA-DR2
LDAC catalogs and apply ``.head`` headers. This rebuild performs the same
catalog-space operation on the host (it is cheap — thousands of points):
detections from each image are cross-matched to an astrometric reference
catalog (a Gaia cache file, or the first image's detections when no
catalog is available) and a linear WCS correction (CRVAL shift + CD refit)
is solved by least squares and applied in place. Degree>1 TPV refitting is
a tracked gap vs SCAMP's DISTORT_DEGREES 3.
"""
from __future__ import annotations

import os

import numpy as np

from .secrets import get_secret

__all__ = ['calibrate_astrometry', 'match_catalogs', 'fit_wcs_correction']


def match_catalogs(ra1, dec1, ra2, dec2, radius_arcsec=2.0):
    """Greedy nearest-neighbor sky match. Returns (idx1, idx2)."""
    from .spatial import angular_distance
    idx1, idx2 = [], []
    if len(ra1) == 0 or len(ra2) == 0:
        return np.array(idx1, int), np.array(idx2, int)
    for i in range(len(ra1)):
        d = angular_distance(ra1[i], dec1[i], ra2, dec2) * 3600.0
        j = int(np.argmin(d))
        if d[j] <= radius_arcsec:
            idx1.append(i)
            idx2.append(j)
    return np.asarray(idx1, int), np.asarray(idx2, int)


def fit_wcs_correction(wcs, x, y, ra_true, dec_true):
    """Least-squares linear correction of a TPV WCS.

    Solves for updated CRVAL and CD such that pix -> sky residuals against
    (ra_true, dec_true) are minimized. Returns a corrected copy.
    """
    from .wcs.tpv import _tan_project
    import copy
    wcs = copy.deepcopy(wcs)
    # current intermediate coords of the matched pixels
    dx = np.asarray(x, float) - wcs.crpix[0]
    dy = np.asarray(y, float) - wcs.crpix[1]
    xi_t, eta_t = _tan_project(ra_true, dec_true, wcs.crval[0], wcs.crval[1])
    # distortion-corrected design: solve [xi eta] = A [dx dy 1]
    A = np.stack([dx, dy, np.ones_like(dx)], axis=1)
    cx, *_ = np.linalg.lstsq(A, xi_t, rcond=None)
    cy, *_ = np.linalg.lstsq(A, eta_t, rcond=None)
    wcs.cd = np.array([[cx[0], cx[1]], [cy[0], cy[1]]])
    # fold the constant terms into CRPIX (keeps CRVAL on the tangent point)
    cdinv = np.linalg.inv(wcs.cd)
    off = cdinv @ np.array([cx[2], cy[2]])
    wcs.crpix = wcs.crpix - off
    # the linear refit supersedes the PV polynomial's linear part only;
    # higher-order PV terms are kept as-is
    return wcs


def _gaia_cache(ra, dec):
    """Load cached astrometric standards near (ra, dec), if present."""
    cache_dir = os.path.expanduser(str(
        get_secret('gaia_cache_directory', '~/.zuds-tpu-gaia')))
    path = os.path.join(cache_dir, f'gaia_{int(ra)}_{int(dec)}.npz')
    if os.path.exists(path):
        d = np.load(path)
        return d['ra'], d['dec']
    return None


def calibrate_astrometry(images, scamp_kws=None, inplace=False,
                         tmpdir='/tmp', reference_catalog=None):
    """Refine the WCS of each image against an astrometric catalog
    (reference: zuds/scamp.py:16-113).

    ``reference_catalog``: optional (ra, dec) arrays; defaults to the Gaia
    cache near the field center, else the first image's detections (internal
    self-alignment — adequate for epoch-to-epoch registration, which is what
    the coadd needs).
    """
    images = list(images)
    if reference_catalog is None:
        first = images[0]
        cached = _gaia_cache(first.ra, first.dec)
        if cached is not None:
            ref_ra, ref_dec = cached
        else:
            from .seeing import select_stars
            stars = select_stars(images[0].catalog)
            ref_ra = stars['X_WORLD']
            ref_dec = stars['Y_WORLD']
    else:
        ref_ra, ref_dec = reference_catalog

    corrected = []
    for im in images:
        from .seeing import select_stars
        stars = select_stars(im.catalog)
        if len(stars) < 5:
            corrected.append(im.wcs)
            continue
        i1, i2 = match_catalogs(stars['X_WORLD'], stars['Y_WORLD'],
                                ref_ra, ref_dec)
        if len(i1) < 5:
            corrected.append(im.wcs)
            continue
        new_wcs = fit_wcs_correction(
            im.wcs, stars['X_IMAGE'][i1], stars['Y_IMAGE'][i1],
            np.asarray(ref_ra)[i2], np.asarray(ref_dec)[i2])
        corrected.append(new_wcs)
        if inplace:
            im.wcs = new_wcs
            if im.ismapped:
                im.save()
    return corrected
