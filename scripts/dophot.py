#!/usr/bin/env python
"""Forced-photometry worker (reference: scripts/dophot.py).

Each rank photometers its share of subtraction frames at every source
position lacking a measurement (q3c anti-join against forcedphotometry),
writes a per-rank CSV, and rank 0 concatenates after the barrier — the
reference's only MPI collectives, kept verbatim in spirit. A wall-clock
self-cap mirrors scripts/dophot.py:104.
"""
import csv
import os
import sys
import time
import traceback

import numpy as np

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work, rank_info, barrier

TIME_BUDGET_S = 45 * 60


def unphotometered_sources(image_id, footprint_corners):
    """Sources inside this image's footprint lacking forced photometry
    (anti-join; reference scripts/dophot.py:58-83)."""
    from zuds_tpu.core import DBSession
    from zuds_tpu.spatial import HasPoly
    sess = DBSession()
    if sess.conn is None:
        return []
    rows = sess.execute(
        'SELECT s.id, s.ra, s.dec FROM sources s WHERE NOT EXISTS '
        '(SELECT 1 FROM forcedphotometry fp WHERE fp.source_id = s.id '
        'AND fp.image_id = ?)', (image_id,)).fetchall()
    out = []
    corners = np.asarray(footprint_corners, dtype=float)
    for sid, ra, dec in rows:
        if ra is None:
            continue
        if HasPoly.poly_contains(corners, ra, dec):
            out.append((sid, ra, dec))
    return out


def do_one(path, writer):
    from zuds_tpu.image import ScienceImage
    sub = ScienceImage.from_file(path)
    image_id = getattr(sub, 'id', None)
    sources = unphotometered_sources(image_id, sub.footprint())
    if not sources:
        return 0
    ras = np.array([s[1] for s in sources])
    decs = np.array([s[2] for s in sources])
    res = zuds.aperture_photometry(sub, ras, decs, apply_calibration=True,
                                   assume_background_subtracted=True)
    for (sid, ra, dec), f, fe, fl in zip(sources, res['flux'],
                                         res['fluxerr'], res['flags']):
        writer.writerow([sid, image_id, ra, dec, float(f), float(fe),
                         int(fl), res['zp'],
                         sub.header.get('OBSJD'),
                         sub.header.get('FILTER', '')])
    return len(sources)


def main(worklist, outdir='.'):
    rank, size = rank_info()
    t_start = time.time()
    outfile = os.path.join(outdir, f'phot.rank{rank}.csv')
    n_done = 0
    with open(outfile, 'w', newline='') as f:
        writer = csv.writer(f)
        for path in get_my_share_of_work(worklist):
            if time.time() - t_start > TIME_BUDGET_S:
                print('time budget exhausted; stopping', flush=True)
                break
            try:
                n = do_one(str(path), writer)
                n_done += n
            except Exception:
                traceback.print_exc()
                continue
    print(f'rank {rank}: {n_done} measurements', flush=True)

    barrier()
    if rank == 0:
        merged = os.path.join(outdir, 'phot.all.csv')
        with open(merged, 'w') as out:
            out.write('source_id,image_id,ra,dec,flux,fluxerr,flags,zp,'
                      'obsjd,filtercode\n')
            for r in range(size):
                part = os.path.join(outdir, f'phot.rank{r}.csv')
                if os.path.exists(part):
                    with open(part) as pf:
                        out.write(pf.read())
        print(f'merged -> {merged}', flush=True)
        return merged


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else '.')
