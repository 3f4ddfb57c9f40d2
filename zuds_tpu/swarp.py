"""Resampling entry points (reference: zuds/swarp.py).

The reference builds swarp command lines; here the same callables drive the
device Lanczos warp directly. ``run_align`` is a drop-in replacement for the
reference's subprocess version (zuds/swarp.py:157-204); the ``prepare_*``
command builders have no subprocess to feed and instead return the
structured parameters their device equivalents consume.
"""
from __future__ import annotations

from .align import align_image
from .constants import BKG_BOX_SIZE, COADD_ZP

__all__ = ['run_align', 'prepare_swarp_sci', 'prepare_swarp_mask',
           'prepare_swarp_align']


def run_align(image, other, tmpdir='/tmp', nthreads=1,
              persist_aligned=False):
    """Align ``image`` onto ``other``'s WCS grid on device
    (reference signature, zuds/swarp.py:157-204)."""
    return align_image(image, other, persist_aligned=persist_aligned)


def prepare_swarp_sci(images, outname, directory=None, swarp_kws=None,
                      swarp_zp_key='MAGZP'):
    """Coadd parameters (replaces the swarp argv builder,
    zuds/swarp.py:29-79): FLXSCALE normalization to the common zeropoint."""
    from .ops.coadd import fluxscale
    scales = []
    for im in images:
        zp = im.header.get(swarp_zp_key)
        s = float(fluxscale(zp)) if zp is not None else 1.0
        im.header.set('FLXSCALE', s, 'Flux scale factor for coadd')
        im.header.set('FLXSCLZP', COADD_ZP, 'FLXSCALE equivalent ZP')
        scales.append(s)
    return {'outname': outname, 'scales': scales,
            'back_size': BKG_BOX_SIZE, 'combine': 'CLIPPED',
            'resampling': 'LANCZOS3'}


def prepare_swarp_mask(masks, outname, mskoutweightname=None, directory=None,
                       swarp_kws=None):
    return {'outname': outname, 'combine': 'AND', 'subtract_back': False}


def prepare_swarp_align(image, other, directory=None, nthreads=1,
                        persist_aligned=False):
    from .mask import MaskImageBase
    combtype = 'OR' if isinstance(image, MaskImageBase) else 'CLIPPED'
    extension = f'_aligned_to_{other.basename[:-5]}.remap' \
        if other.basename else '_aligned.remap'
    outname = (image.basename or 'image.fits').replace(
        '.fits', f'{extension}.fits')
    return {'target_wcs': other.wcs, 'combine': combtype,
            'outname': outname}
