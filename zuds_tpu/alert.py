"""Alert packet construction (reference: zuds/alert.py).

``Alert.from_detection`` assembles the candidate dict (detection
measurements, image metadata, detection history, light curve, crossmatch
enrichment, gzip-FITS cutouts) exactly in the reference's shape
(``zuds/alert.py:59-293``); network-backed crossmatches degrade to empty
enrichment offline.
"""
from __future__ import annotations

import gzip
import json

import numpy as np

from .constants import CUTOUT_SIZE, MJD_TO_JD
from .db.orm import Column, Model

__all__ = ['Alert']


class Alert(Model):
    """One outgoing alert packet (JSONB-equivalent storage)."""

    __tablename__ = 'alerts'

    detection_id = Column('INTEGER', index=True)
    alert = Column('TEXT')               # JSON candidate payload
    creation_index = Column('INTEGER')
    sent = Column('INTEGER', default=0, index=True)
    cutout_science = Column('BLOB')
    cutout_template = Column('BLOB')
    cutout_difference = Column('BLOB')

    @property
    def payload(self):
        return json.loads(self.alert) if self.alert else None

    @classmethod
    def from_detection(cls, detection, xmatch_enabled=True):
        """Build the alert for ``detection`` (reference:
        zuds/alert.py:59-293)."""
        from .core import DBSession
        from .detections import Detection

        image = getattr(detection, 'image', None)
        source_id = getattr(detection, 'source_id', None)

        jd = None
        if image is not None:
            jd = image.header.get('OBSJD')
            if jd is None and 'OBSMJD' in image.header:
                jd = image.header['OBSMJD'] + MJD_TO_JD

        candidate = {
            'jd': jd,
            'ra': detection.ra,
            'dec': detection.dec,
            'fid': getattr(image, 'fid', None) if image is not None else None,
            'magpsf': detection.mag if np.isfinite(detection.mag) else None,
            'sigmapsf': None,
            'fwhm': detection.fwhm_image,
            'elong': detection.elongation,
            'aimage': detection.a_image,
            'bimage': detection.b_image,
            'flux': detection.flux_aper,
            'fluxerr': detection.fluxerr_aper,
            'snr': float(detection.snr) if np.isfinite(detection.snr)
            else None,
            'rb': detection.rb,
            'rbversion': 'braai_d6_m9-flax',
            'xpos': detection.x_image,
            'ypos': detection.y_image,
            'flags_weight': detection.flags_weight,
            'imaflags_iso': detection.imaflags_iso,
            'magzpsci': detection.zp,
            'field': getattr(image, 'field', None)
            if image is not None else None,
            'programid': 2,
        }

        # detection history + light curve (DB-backed; empty offline)
        sess = DBSession()
        prv_candidates = []
        light_curve = []
        if sess.conn is not None and source_id:
            hist = sess.query(Detection).filter_by(source_id=source_id).all()
            for d in hist:
                if d.id == detection.id:
                    continue
                prv_candidates.append({
                    'jd': None, 'ra': d.ra, 'dec': d.dec,
                    'flux': d.flux_aper, 'fluxerr': d.fluxerr_aper,
                    'rb': d.rb, 'snr': float(d.snr)
                    if d.snr and np.isfinite(d.snr) else None,
                })
            from .source import Source
            src = sess.query(Source).filter_by(id=source_id).first()
            if src is not None:
                for row in src.light_curve():
                    light_curve.append({
                        'jd': float(row['obsjd']) if np.isfinite(
                            row['obsjd']) else None,
                        'filter': str(row['filtercode']),
                        'zp': float(row['zp']),
                        'flux': float(row['flux']) if np.isfinite(
                            row['flux']) else None,
                        'fluxerr': float(row['fluxerr']) if np.isfinite(
                            row['fluxerr']) else None,
                        'flags': int(row['flags']),
                    })

        # crossmatch enrichment (network-gated)
        xmatch_info = {}
        if xmatch_enabled:
            try:
                from .crossmatch import xmatch
                xmatch_info = xmatch(detection.ra, detection.dec) or {}
            except Exception:
                xmatch_info = {}
        candidate.update(xmatch_info)

        # cutouts
        cutouts = {}
        if image is not None and hasattr(image, 'data'):
            from .thumbnails import Thumbnail
            for name, img in [('difference', image),
                              ('science', getattr(image, 'target_image',
                                                  None)),
                              ('template', getattr(image, 'reference_image',
                                                   None))]:
                if img is None or not hasattr(img, 'data'):
                    continue
                try:
                    t = Thumbnail.from_detection(detection, img,
                                                 stamp_type=name)
                    cutouts[name] = t.bytes
                except Exception:
                    continue

        obj = cls(
            detection_id=getattr(detection, 'id', None),
            alert=json.dumps({
                'candid': getattr(detection, 'id', None),
                'objectId': source_id,
                'candidate': candidate,
                'prv_candidates': prv_candidates,
                'light_curve': light_curve,
            }),
            cutout_science=cutouts.get('science'),
            cutout_template=cutouts.get('template'),
            cutout_difference=cutouts.get('difference'),
        )
        obj.detection = detection
        return obj

    def to_dict(self):
        d = super().to_dict()
        return d
