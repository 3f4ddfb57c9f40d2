#!/usr/bin/env python
"""Emit reference-build work lists: quadrants with enough good epochs and
no current-version reference (reference: scripts/queryref.py:12-30)."""
import sys

from zuds_tpu.constants import REFERENCE_VERSION


def main(min_epochs=14):
    from zuds_tpu.core import DBSession
    sess = DBSession()
    rows = sess.execute(
        'SELECT field, ccdid, qid, fid, COUNT(*) as n FROM ztffiles '
        'WHERE type = "sci" GROUP BY field, ccdid, qid, fid '
        'HAVING n >= ? ', (min_epochs,)).fetchall()
    for field, ccdid, qid, fid, n in rows:
        has_ref = sess.execute(
            'SELECT 1 FROM ztffiles WHERE type = "ref" AND field = ? AND '
            'ccdid = ? AND qid = ? AND fid = ? AND version = ? LIMIT 1',
            (field, ccdid, qid, fid, REFERENCE_VERSION)).fetchone()
        if has_ref:
            continue
        paths = [r[0] for r in sess.execute(
            'SELECT basename FROM ztffiles WHERE type = "sci" AND '
            'field = ? AND ccdid = ? AND qid = ? AND fid = ?',
            (field, ccdid, qid, fid)).fetchall()]
        outname = (f'ref_{field:06d}_c{ccdid:02d}_q{qid}_{fid}_'
                   f'{REFERENCE_VERSION}.fits')
        print(' '.join([outname] + paths))


if __name__ == '__main__':
    import zuds_tpu
    zuds_tpu.init_db()
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 14)
