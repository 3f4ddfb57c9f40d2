"""Alert enrichment crossmatches (reference: zuds/crossmatch.py).

The reference queries Kowalski (PS1/sgscore, ZTF alerts, milliquas, TNS) and
a private DR8 postgres. Those services are unreachable from an offline TPU
pod, so every service is gated: locally-loaded DR8/CLU tables (``external``
models) are searched through the q3c-equivalent layer, and remote services
are attempted only when credentials are configured and the client import
succeeds. ``xmatch`` aggregates whatever succeeded — identical output keys,
graceful degradation.
"""
from __future__ import annotations

import json

import numpy as np

from .constants import MATCH_RADIUS_DEG
from .secrets import get_secret
from .spatial import cone_where, angular_distance

__all__ = ['xmatch', 'xmatch_dr8', 'xmatch_clu', 'ps1_info']


def _cone_rows(model, ra, dec, radius):
    from .core import DBSession
    sess = DBSession()
    if sess.conn is None:
        return []
    where, params = cone_where(ra, dec, radius)
    return sess.query(model).filter(where, *params).all()


def xmatch_dr8(ra, dec, radius=30.0 / 3600.0):
    """Nearest LegacySurvey DR8 matches from the local tables (reference
    queries the desi postgres, zuds/crossmatch.py:189-241)."""
    from .external import DR8North, DR8South
    out = []
    for model, survey in [(DR8North, 'n'), (DR8South, 's')]:
        for row in _cone_rows(model, ra, dec, radius):
            d = row.to_dict()
            if d.get('extra'):
                try:
                    d.update(json.loads(d.pop('extra')))
                except (TypeError, ValueError):
                    pass
            d['survey'] = survey
            d['sep_arcsec'] = float(angular_distance(ra, dec, row.ra,
                                                     row.dec) * 3600.0)
            out.append(d)
    out.sort(key=lambda d: d['sep_arcsec'])
    return out


def xmatch_clu(ra, dec, radius=60.0 / 3600.0):
    """CLU galaxy matches from the local table."""
    from .external import CLU
    rows = _cone_rows(CLU, ra, dec, radius)
    out = []
    for row in rows:
        d = row.to_dict()
        d['sep_arcsec'] = float(angular_distance(ra, dec, row.ra, row.dec)
                                * 3600.0)
        out.append(d)
    out.sort(key=lambda d: d['sep_arcsec'])
    return out


def _kowalski():
    """Authenticated Kowalski client, or None when gated."""
    user = get_secret('kowalski_username')
    pw = get_secret('kowalski_password')
    if not user or not pw:
        return None
    try:
        from penquins import Kowalski  # pragma: no cover
        return Kowalski(username=user, password=pw)
    except Exception:
        return None


def ps1_info(ra, dec, radius=30.0 / 3600.0):
    """PS1 DR1 + star/galaxy score via Kowalski (reference:
    zuds/crossmatch.py:85-186). Empty offline."""
    k = _kowalski()
    if k is None:
        return []
    q = {'query_type': 'cone_search',
         'query': {'object_coordinates': {
             'radec': f'[({ra}, {dec})]',
             'cone_search_radius': radius * 3600,
             'cone_search_unit': 'arcsec'},
             'catalogs': {'PS1_DR1': {'filter': {}, 'projection': {}}}}}
    try:  # pragma: no cover - network
        r = k.query(q)
        return list(r['data']['PS1_DR1'].values())[0]
    except Exception:
        return []


def xmatch(ra, dec):
    """Aggregate enrichment dict for one position (reference:
    zuds/crossmatch.py:386-412)."""
    out = {}
    dr8 = xmatch_dr8(ra, dec)
    if dr8:
        best = dr8[0]
        out['dr8_sep'] = best['sep_arcsec']
        out['dr8_type'] = best.get('type')
        out['dr8_zphot'] = best.get('z_phot_median')
        out['dr8_zspec'] = best.get('z_spec')
    clu = xmatch_clu(ra, dec)
    if clu:
        best = clu[0]
        out['clu_name'] = best.get('name')
        out['clu_z'] = best.get('z')
        out['clu_distmpc'] = best.get('distmpc')
        out['clu_sep'] = best['sep_arcsec']
    ps1 = ps1_info(ra, dec)
    if ps1:
        best = ps1[0]
        out['sgscore1'] = best.get('sgscore')
        out['distpsnr1'] = best.get('sep_arcsec')
        out['srmag1'] = best.get('rMeanPSFMag')
    return out
