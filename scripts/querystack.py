#!/usr/bin/env python
"""Emit science-stack work lists: 7-day bins per quadrant
(reference: scripts/querystack.py:13-63)."""
import sys

import numpy as np

WINDOW_DAYS = 7.0


def stack_windows(rows):
    """rows: (basename, field, ccdid, qid, fid, obsmjd). Returns work lines
    'outname binleft binright paths...' per (quadrant, window)."""
    from collections import defaultdict
    groups = defaultdict(list)
    for basename, field, ccdid, qid, fid, mjd, path in rows:
        groups[(field, ccdid, qid, fid)].append((mjd, path))
    lines = []
    for (field, ccdid, qid, fid), items in sorted(groups.items()):
        items.sort()
        mjds = np.array([m for m, _ in items])
        start = np.floor(mjds.min())
        nbins = int(np.ceil((mjds.max() - start + 1e-9) / WINDOW_DAYS)) or 1
        for b in range(nbins):
            lo = start + b * WINDOW_DAYS
            hi = lo + WINDOW_DAYS
            sel = [(m, p) for m, p in items if lo <= m < hi]
            if len(sel) < 2:
                continue
            outname = (f'stack_{field:06d}_c{ccdid:02d}_q{qid}_{fid}_'
                       f'{int(lo)}_{int(hi)}.fits')
            lines.append(' '.join([outname, f'{lo:.1f}', f'{hi:.1f}']
                                  + [p for _, p in sel]))
    return lines


def main():
    from zuds_tpu.core import DBSession
    sess = DBSession()
    rows = sess.execute(
        'SELECT basename, field, ccdid, qid, fid, obsjd - 2400000.5, '
        'basename FROM ztffiles WHERE type = "sci" AND obsjd IS NOT NULL'
    ).fetchall()
    for line in stack_windows(rows):
        print(line)


if __name__ == '__main__':
    import zuds_tpu
    zuds_tpu.init_db()
    main()
