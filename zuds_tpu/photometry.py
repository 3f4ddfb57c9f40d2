"""Forced aperture photometry, host API (reference: zuds/photometry.py).

Both entry points keep the reference's signatures but the pixel work is one
batched device call (``ops/photometry.py``) instead of a per-source
photutils loop (``zuds/photometry.py:61-113``, the hot loop of
``scripts/dophot.py``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from .constants import APERTURE_RADIUS_PX, APER_KEY, BAD_SUM

__all__ = ['ForcedPhotometry', 'raw_aperture_photometry',
           'aperture_photometry']


@dataclass
class ForcedPhotometry:
    """One source x image forced-photometry measurement (maps to the
    ``forcedphotometry`` table when the DB layer is bound)."""

    flux: float = np.nan
    fluxerr: float = np.nan
    flags: int = 0
    ra: float = np.nan
    dec: float = np.nan
    zp: float = 0.0
    filtercode: Optional[str] = None
    obsjd: Optional[float] = None
    uniform: bool = False
    source: Any = None
    image: Any = None
    id: Optional[int] = None

    @property
    def mag(self):
        return self.zp - 2.5 * np.log10(self.flux) if self.flux > 0 \
            else np.nan

    @property
    def magerr(self):
        return 1.0857 * self.fluxerr / self.flux if self.flux > 0 else np.nan


def raw_aperture_photometry(sci_path, rms_path, mask_path, ra, dec,
                            apply_calibration=False):
    """Path-based forced photometry (reference: zuds/photometry.py:61-113).

    Loads the three frames, converts sky positions, and measures r=3px
    apertures in one device call. Returns a dict of arrays (flux, fluxerr,
    flags, zp).
    """
    import jax.numpy as jnp
    from .image import FITSImage
    from .mask import MaskImageBase
    from .ops.photometry import aperture_photometry_batched

    sci = FITSImage.from_file(sci_path)
    rms = FITSImage.from_file(rms_path)
    mask = MaskImageBase.from_file(mask_path)

    ra = np.atleast_1d(np.asarray(ra, dtype=float))
    dec = np.atleast_1d(np.asarray(dec, dtype=float))
    x, y = sci.wcs.sky2pix_0(ra, dec)

    out = aperture_photometry_batched(
        jnp.asarray(np.ascontiguousarray(sci.data).astype(np.float32)),
        jnp.asarray(np.ascontiguousarray(rms.data).astype(np.float32)),
        jnp.asarray(np.ascontiguousarray(mask.data).astype(np.uint32)),
        jnp.asarray(x.astype('f4')), jnp.asarray(y.astype('f4')),
        r=float(APERTURE_RADIUS_PX))

    flux = np.array(out['flux'])
    fluxerr = np.array(out['fluxerr'])
    flags = np.array(out['flags'])
    oob = np.array(out['oob'])
    flux[oob] = np.nan
    fluxerr[oob] = np.nan

    zp = sci.header.get('MAGZP', 0.0) or 0.0
    if apply_calibration:
        apcor = sci.header.get(APER_KEY, 0.0) or 0.0
        zp = zp + apcor
    badflags = (flags & BAD_SUM) > 0
    return {'flux': flux, 'fluxerr': fluxerr, 'flags': flags,
            'bad': badflags | oob, 'zp': zp, 'x': x, 'y': y}


def aperture_photometry(calibratable, ra, dec, apply_calibration=False,
                        assume_background_subtracted=False,
                        use_cutout=False, direct_load=None):
    """Object-based forced photometry (reference: zuds/photometry.py:116-249).

    ``use_cutout`` in the reference memmaps per-source cutouts to dodge
    loading 37MB frames; on device the full-frame batched path is faster in
    all regimes, so the flag is accepted and ignored.
    """
    import jax.numpy as jnp
    from .ops.photometry import aperture_photometry_batched

    ra = np.atleast_1d(np.asarray(ra, dtype=float))
    dec = np.atleast_1d(np.asarray(dec, dtype=float))
    x, y = calibratable.wcs.sky2pix_0(ra, dec)

    if assume_background_subtracted:
        pixels = np.ascontiguousarray(calibratable.data).astype(np.float32)
    else:
        pixels = np.ascontiguousarray(
            calibratable.background_subtracted_image.data).astype(np.float32)
    rms = np.ascontiguousarray(calibratable.rms_image.data).astype(np.float32)
    if calibratable.mask_image is not None:
        mask = np.ascontiguousarray(
            calibratable.mask_image.data).astype(np.uint32)
    else:
        mask = np.zeros(pixels.shape, dtype=np.uint32)

    out = aperture_photometry_batched(
        jnp.asarray(pixels), jnp.asarray(rms), jnp.asarray(mask),
        jnp.asarray(x.astype('f4')), jnp.asarray(y.astype('f4')),
        r=float(APERTURE_RADIUS_PX))

    flux = np.array(out['flux'])
    fluxerr = np.array(out['fluxerr'])
    flags = np.array(out['flags'])
    oob = np.array(out['oob'])
    flux[oob] = np.nan
    fluxerr[oob] = np.nan

    zp = calibratable.header.get('MAGZP', 0.0) or 0.0
    if apply_calibration:
        zp = zp + (calibratable.header.get(APER_KEY, 0.0) or 0.0)
    return {'flux': flux, 'fluxerr': fluxerr, 'flags': flags,
            'bad': ((flags & BAD_SUM) > 0) | oob, 'zp': zp, 'x': x, 'y': y}
