"""Detection stamp thumbnails (reference: zuds/thumbnails.py).

63x63 cutouts around detections in new/ref/sub frames, gzip-FITS bytes
stored in the DB (BYTEA analogue: sqlite BLOB) and renderable to JPEG/PNG.
"""
from __future__ import annotations

import gzip

import numpy as np

from .constants import CUTOUT_SIZE
from .db.orm import Column, Model

__all__ = ['Thumbnail', 'make_stamp']


def make_stamp(name, ra, dec, vmin, vmax, data, wcs, save_fits=False,
               size=CUTOUT_SIZE):
    """Cut a size x size stamp centered on (ra, dec) (reference:
    zuds/thumbnails.py:133-146)."""
    x, y = wcs.sky2pix_0(ra, dec)
    x = int(round(float(x)))
    y = int(round(float(y)))
    half = size // 2
    H, W = data.shape
    stamp = np.zeros((size, size), dtype=data.dtype)
    y0, y1 = max(0, y - half), min(H, y + half + 1)
    x0, x1 = max(0, x - half), min(W, x + half + 1)
    sy0 = y0 - (y - half)
    sx0 = x0 - (x - half)
    stamp[sy0:sy0 + (y1 - y0), sx0:sx0 + (x1 - x0)] = data[y0:y1, x0:x1]
    return stamp


class Thumbnail(Model):
    """One stamp image of one detection (new/ref/sub/sdss/dr8)."""

    __tablename__ = 'thumbnails'

    type = Column('TEXT')                # new | ref | sub | sdss | dr8
    detection_id = Column('INTEGER', index=True)
    source_id = Column('TEXT', index=True)
    bytes = Column('BLOB')
    public_url = Column('TEXT')
    file_uri = Column('TEXT')

    @classmethod
    def from_detection(cls, detection, image, stamp_type='sub'):
        """Build a gzip-FITS thumbnail of ``detection`` on ``image``
        (reference: zuds/thumbnails.py:54-94)."""
        from .fits import Header, HDU, write_fits

        stamp = make_stamp(None, detection.ra, detection.dec, None, None,
                           np.asarray(image.data), image.wcs)
        h = Header()
        h.set('RA', float(detection.ra))
        h.set('DEC', float(detection.dec))
        h.set('STMPTYPE', stamp_type)
        import tempfile
        import os
        with tempfile.NamedTemporaryFile(suffix='.fits', delete=False) as f:
            tmp = f.name
        try:
            write_fits(tmp, [HDU(h, stamp.astype('f4'))])
            with open(tmp, 'rb') as f:
                raw = f.read()
        finally:
            os.unlink(tmp)
        obj = cls(type=stamp_type,
                  detection_id=getattr(detection, 'id', None),
                  bytes=gzip.compress(raw))
        obj.detection = detection
        obj.stamp = stamp
        return obj

    def persist(self, directory=None):
        """Render to PNG in the public web directory (reference:
        zuds/thumbnails.py:96-119)."""
        import os
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from .secrets import get_secret
        from .image import zscale_limits

        directory = directory or get_secret('base_data_directory',
                                            '/tmp/zuds-tpu-data')
        os.makedirs(directory, exist_ok=True)
        name = f'thumb_{self.type}_{self.detection_id or "x"}.png'
        path = os.path.join(directory, name)
        stamp = getattr(self, 'stamp', None)
        if stamp is None and self.bytes:
            from .fits import read_fits
            import tempfile
            raw = gzip.decompress(self.bytes)
            with tempfile.NamedTemporaryFile(suffix='.fits') as f:
                f.write(raw)
                f.flush()
                stamp = read_fits(f.name)[0].data
        vmin, vmax = zscale_limits(stamp)
        fig, ax = plt.subplots(figsize=(2, 2), dpi=100)
        ax.imshow(stamp, vmin=vmin, vmax=vmax, cmap='gray', origin='lower')
        ax.axis('off')
        fig.savefig(path, bbox_inches='tight', pad_inches=0)
        plt.close(fig)
        self.file_uri = path
        return path
