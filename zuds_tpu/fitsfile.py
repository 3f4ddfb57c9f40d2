"""FITS-backed files and WCS-aware mixin (reference: zuds/fitsfile.py).

``FITSFile`` couples the File protocol to the standalone FITS codec;
``HasWCS`` adds TPV WCS transforms, sky footprints, and the ``aligned_to``
resampling entry point (the reference's swarp-align call chain,
``zuds/fitsfile.py:290-314`` -> here a device Lanczos warp).
"""
from __future__ import annotations

import os

import numpy as np

from .file import File
from .fits import Header, HDU, read_fits, write_fits, read_header
from .wcs import TPVWCS, pixel_mapping

__all__ = ['FITSFile', 'HasWCS']


class FITSFile(File):
    """A File whose on-disk representation is a single-HDU FITS image."""

    __diskmapped_cached_properties__ = ['_path', '_data']

    header = None

    def __init__(self, basename=None, data=None, header=None):
        super().__init__(basename)
        if header is not None:
            self.header = header
        if self.header is None:
            self.header = Header()
        if data is not None:
            self._data = data

    # -- construction ---------------------------------------------------------
    @classmethod
    def from_file(cls, fname, load_data=False, **kwargs):
        obj = cls.__new__(cls)
        File.__init__(obj)
        obj.header = read_header(fname)
        obj.map_to_local_file(fname)
        obj.basename = os.path.basename(fname)
        if load_data:
            obj.load()
        return obj

    # -- header conveniences --------------------------------------------------
    @property
    def header_comments(self):
        return self.header.comments

    @property
    def astropy_header(self):
        """Compatibility alias: this framework's Header plays that role."""
        return self.header

    def load_header(self):
        self.header = read_header(self.local_path)

    # -- data -----------------------------------------------------------------
    @property
    def data(self):
        try:
            return self._data
        except AttributeError:
            self.load()
        return self._data

    @data.setter
    def data(self, value):
        self._data = value

    def load(self):
        hdu = None
        # fast path: native multi-threaded reader (single-image files)
        from .fits import native
        if native.available():
            try:
                hdu = native.read_image_native(self.local_path)
            except (IOError, KeyError):
                hdu = None
        if hdu is None or hdu.data is None:
            hdus = read_fits(self.local_path)
            hdu = next((h for h in hdus if h.data is not None), hdus[0])
        self._data = hdu.data
        if len(hdu.header) > len(self.header or ()):
            self.header = hdu.header

    def unload(self):
        if hasattr(self, '_data'):
            del self._data

    def save(self, path=None):
        if path is not None:
            self.map_to_local_file(path)
        data = self._data if hasattr(self, '_data') else None
        data = np.asarray(data) if data is not None else None
        write_fits(self.local_path, [HDU(self.header, data)])

    def __repr__(self):
        return f'<{type(self).__name__} {self.basename}>'


class HasWCS(FITSFile):
    """FITSFile with a TPV world coordinate system."""

    @property
    def wcs(self):
        try:
            return self._wcs
        except AttributeError:
            self._wcs = TPVWCS.from_header(self.header)
        return self._wcs

    @wcs.setter
    def wcs(self, value):
        self._wcs = value
        value.to_header(self.header)

    @classmethod
    def from_file(cls, fname, **kwargs):
        obj = super().from_file(fname, **kwargs)
        # cache sky corners / center like the reference's ra1..4 columns
        naxis1 = obj.header.get('NAXIS1')
        naxis2 = obj.header.get('NAXIS2')
        if naxis1 and naxis2 and 'CRVAL1' in obj.header:
            fp = obj.wcs.footprint(naxis1, naxis2)
            for i in range(4):
                setattr(obj, f'ra{i + 1}', float(fp[i, 0]))
                setattr(obj, f'dec{i + 1}', float(fp[i, 1]))
            ra, dec = obj.wcs.center(naxis1, naxis2)
            obj.ra = float(ra)
            obj.dec = float(dec)
        return obj

    @property
    def shape(self):
        if 'NAXIS2' in self.header and 'NAXIS1' in self.header:
            return (self.header['NAXIS2'], self.header['NAXIS1'])
        return self.data.shape

    @property
    def pixel_scale(self):
        """Pixel scale in arcsec (mean of axes, from the CD determinant)."""
        return self.wcs.pixel_scale_arcsec()

    def footprint(self):
        h, w = self.shape
        return self.wcs.footprint(w, h)

    def contains(self, ra, dec):
        """True where (ra, dec) lands inside the frame."""
        h, w = self.shape
        x, y = self.wcs.sky2pix_0(np.asarray(ra), np.asarray(dec))
        return (x >= -0.5) & (x <= w - 0.5) & (y >= -0.5) & (y <= h - 0.5)

    def mapping_to(self, other, step=32):
        """Coarse pixel mapping from this frame onto ``other``'s grid."""
        h, w = other.shape
        return pixel_mapping(self.wcs, other.wcs, (h, w), step=step)

    def aligned_to(self, other, persist_aligned=False, tmpdir=None, **kw):
        """Device-resample this image onto ``other``'s WCS pixel grid.

        Replaces the reference's per-image swarp subprocess
        (``zuds/fitsfile.py:290-314`` -> ``zuds/swarp.py:157-204``). Masks
        dispatch to the conservative OR warp; science frames to the
        Lanczos-3 warp. Returns a new in-memory object of matching type with
        the target WCS and the alignment-nodata bit applied by callers via
        the returned object's ``coverage``.
        """
        from .align import align_image
        return align_image(self, other, persist_aligned=persist_aligned)

    @property
    def sources_contained(self):
        raise NotImplementedError('DB-backed query; requires init_db()')
