"""Detection entry points (reference: zuds/sextractor.py).

``run_sextractor`` keeps the reference's call signature and product list
(catalog + requested check-images, zuds/sextractor.py:110-150) but computes
everything with the device ops instead of forking ``sex``.
"""
from __future__ import annotations

__all__ = ['run_sextractor', 'prepare_sextractor']

CHECKIMAGE_TYPES = ('rms', 'segm', 'bkgsub', 'bkg')


def run_sextractor(calibratable, checkimage_type=None, tmpdir='/tmp',
                   use_weightmap=True, sextractor_kws=None):
    """Catalog + check-images for ``calibratable``.

    Returns [catalog, <checkimages...>] mirroring the reference's product
    wrapping (zuds/sextractor.py:110-150): suffixes .cat/.rms.fits/
    .bkg.fits/.bkgsub.fits/.segm.fits.
    """
    from .catalog import PipelineFITSCatalog
    checkimage_type = checkimage_type or []
    if isinstance(checkimage_type, str):
        checkimage_type = [checkimage_type]
    cat = PipelineFITSCatalog.from_image(calibratable)
    results = [cat]
    attr_map = {'rms': 'rms_image', 'bkg': 'background_image',
                'bkgsub': 'background_subtracted_image',
                'segm': 'segm_image'}
    for ct in checkimage_type:
        if ct not in attr_map:
            raise ValueError(f'unknown checkimage type {ct!r}')
        results.append(getattr(calibratable, attr_map[ct]))
    return results


def prepare_sextractor(image, checkimage_type=None, **kwargs):
    """Detection parameters (replaces the sex argv builder)."""
    from .constants import DETECT_NSIGMA, DETECT_NPIX, BKG_BOX_SIZE
    return {'detect_thresh': DETECT_NSIGMA, 'detect_minarea': DETECT_NPIX,
            'back_size': BKG_BOX_SIZE,
            'checkimages': checkimage_type or []}
