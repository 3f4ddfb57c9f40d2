#!/usr/bin/env python
"""Source association daemon (reference: nersc/makesources.py).

Two-stage association of new detections:
1. match to existing named sources within MATCH_RADIUS (the q3c-join,
   reference makesources.py:263-286);
2. density-cluster the leftovers with rb > RB_ASSOC_MIN at 2 arcsec
   (the reference runs DBSCAN on a sparse angular-distance matrix,
   makesources.py:303-340 — here an equivalent union-find single-linkage
   clustering with the same radius and min-size semantics), naming a new
   source per cluster with >= MIN_CLUSTER detections, then bulk-inserting
   names, flagging ``triggers_alert``.
"""
from __future__ import annotations

import sys
import time

import numpy as np

from zuds_tpu.constants import MATCH_RADIUS_DEG, RB_ASSOC_MIN

MIN_CLUSTER = 2


def cluster_positions(ra, dec, radius_deg=MATCH_RADIUS_DEG):
    """Single-linkage clustering at ``radius_deg``: returns labels (N,).

    Union-find over a GRID-HASHED pair graph on 3-D unit vectors: two
    points within angular distance r have chord (Euclidean) distance
    <= 2*sin(r/2), so hashing into cubic cells of that side and examining
    the 3x3x3 neighborhood finds every candidate pair — exact at all
    declinations and wrap-safe at the RA antimeridian and the poles
    (a tangent-plane hash keyed off the median dec is not: pairs far
    from the median dec land >1 cell apart and are never compared).
    O(N + E) total. Equivalent to DBSCAN(eps=radius, min_samples=1)
    cluster membership, matching the reference's sparse-matrix DBSCAN
    association (nersc/makesources.py:303-340).
    """
    from zuds_tpu.spatial import angular_distance
    n = len(ra)
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[rj] = ri

    if n == 0:
        return parent
    ra_r = np.radians(np.asarray(ra, float))
    dec_r = np.radians(np.asarray(dec, float))
    cosd = np.cos(dec_r)
    xyz = np.stack([cosd * np.cos(ra_r), cosd * np.sin(ra_r),
                    np.sin(dec_r)], axis=1)
    # chord length subtended by radius_deg on the unit sphere
    cell = 2.0 * np.sin(np.radians(radius_deg) / 2.0)
    buckets = {}
    keys = np.floor(xyz / cell).astype(int)
    for i, key in enumerate(map(tuple, keys)):
        buckets.setdefault(key, []).append(i)
    for (ci, cj, ck), members in buckets.items():
        cand = []
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                for dk in (-1, 0, 1):
                    cand.extend(buckets.get((ci + di, cj + dj, ck + dk), ()))
        for i in members:
            for j in cand:
                if j <= i:
                    continue
                if angular_distance(ra[i], dec[i],
                                    ra[j], dec[j]) <= radius_deg:
                    union(i, j)
    return np.array([find(i) for i in range(n)])


def generate_source_name(session):
    """ZUDSyyabcdef-style names (sequential suffix)."""
    import datetime
    yy = datetime.datetime.utcnow().strftime('%y')
    count = session.execute(
        'SELECT COUNT(*) FROM sources').fetchone()[0]
    suffix = ''
    k = count
    for _ in range(6):
        suffix = chr(ord('a') + k % 26) + suffix
        k //= 26
    return f'ZUDS{yy}{suffix}'


def associate(session):
    """One association pass. Returns (n_matched, n_new_sources)."""
    from zuds_tpu.detections import Detection
    from zuds_tpu.source import Source
    from zuds_tpu.spatial import cone_where

    unassigned = session.query(Detection).filter(
        'source_id IS NULL AND goodcut = 1').all()
    if not unassigned:
        return 0, 0

    # stage 1: match against existing sources
    matched = 0
    leftovers = []
    for det in unassigned:
        where, params = cone_where(det.ra, det.dec, MATCH_RADIUS_DEG)
        src = session.query(Source).filter(where, *params).first()
        if src is not None:
            det.source_id = src.id
            det.triggers_alert = 1
            session.add(det)
            matched += 1
        else:
            leftovers.append(det)
    session.commit()

    # stage 2: cluster high-rb leftovers into new sources
    clusterable = [d for d in leftovers
                   if d.rb is not None and d.rb > RB_ASSOC_MIN]
    n_new = 0
    if len(clusterable) >= MIN_CLUSTER:
        ra = np.array([d.ra for d in clusterable])
        dec = np.array([d.dec for d in clusterable])
        labels = cluster_positions(ra, dec)
        for lab in np.unique(labels):
            members = [clusterable[i] for i in np.nonzero(labels == lab)[0]]
            if len(members) < MIN_CLUSTER:
                continue
            name = generate_source_name(session)
            src = Source(id=name,
                         ra=float(np.mean([m.ra for m in members])),
                         dec=float(np.mean([m.dec for m in members])),
                         origin='zuds-tpu')
            session.add(src)
            session.commit()
            for m in members:
                m.source_id = name
                m.triggers_alert = 1
                m.triggers_phot = 1
                session.add(m)
            session.commit()
            n_new += 1
    return matched, n_new


def main(once=False, poll_s=60):
    import zuds_tpu
    zuds_tpu.init_db()
    from zuds_tpu.core import DBSession
    while True:
        sess = DBSession()
        try:
            matched, new = associate(sess)
            print(f'associated {matched} detections; named {new} new '
                  f'sources', flush=True)
        except Exception:
            import traceback
            traceback.print_exc()
            sess.rollback()
        if once:
            break
        time.sleep(poll_s)


if __name__ == '__main__':
    main(once='--once' in sys.argv)
