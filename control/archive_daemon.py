#!/usr/bin/env python
"""Archive/retrieval daemons (reference: nersc/retrieve.py + download.py).

The reference stages quadrants between HPSS tape, the NERSC web directory,
and scratch. Here the same bookkeeping drives a generic two-tier store:
``base_data_directory`` (hot) and an optional cold directory or remote
(tape/object-store seam). hsi/tar orchestration is replaced by plain tar
over the cold tier; IPAC mass download stays network-gated.
"""
from __future__ import annotations

import os
import sys
import tarfile
import time

CHUNK = 256        # files per retrieval batch (reference download.py:21)
TAR_SIZE = 1024    # members per archive tarball (reference download.py:22)


def archive_to_cold(session, cold_dir):
    """Tar un-archived products into the cold tier
    (reference: nersc/download.py tape path)."""
    from zuds_tpu.archive import TapeArchive, TapeCopy
    rows = session.execute(
        'SELECT z.id, z.basename FROM ztffiles z WHERE z.type = "sci" AND '
        'NOT EXISTS (SELECT 1 FROM tapecopies t WHERE t.product_id = z.id) '
        f'LIMIT {TAR_SIZE}').fetchall()
    if not rows:
        return None
    os.makedirs(cold_dir, exist_ok=True)
    name = f'zuds_{int(time.time())}.tar'
    tar_path = os.path.join(cold_dir, name)
    arc = TapeArchive(name=name, status='writing')
    session.add(arc)
    session.commit()
    from zuds_tpu.secrets import get_secret
    hot = get_secret('base_data_directory', '/tmp/zuds-tpu-data')
    n = 0
    with tarfile.open(tar_path, 'w') as tf:
        for pid, basename in rows:
            src = os.path.join(hot, basename)
            if not os.path.exists(src):
                continue
            tf.add(src, arcname=basename)
            session.add(TapeCopy(type='tape', product_id=pid, tarname=name,
                                 member_name=basename))
            n += 1
    arc.status = 'done'
    arc.size = os.path.getsize(tar_path)
    session.add(arc)
    session.commit()
    return tar_path if n else None


def retrieve_from_cold(session, basenames, cold_dir, dest_dir):
    """Pull products back from cold tarballs, grouped per tarball so each
    archive is read once (reference: nersc/retrieve.py tape ordering)."""
    from collections import defaultdict
    by_tar = defaultdict(list)
    for basename in basenames:
        row = session.execute(
            'SELECT tarname FROM tapecopies WHERE member_name = ? '
            'ORDER BY id DESC LIMIT 1', (basename,)).fetchone()
        if row:
            by_tar[row[0]].append(basename)
    os.makedirs(dest_dir, exist_ok=True)
    restored = []
    for tarname, members in by_tar.items():
        path = os.path.join(cold_dir, tarname)
        if not os.path.exists(path):
            continue
        with tarfile.open(path) as tf:
            for m in members:
                try:
                    tf.extract(m, dest_dir)
                    restored.append(os.path.join(dest_dir, m))
                except KeyError:
                    continue
    return restored


if __name__ == '__main__':
    import zuds_tpu
    zuds_tpu.init_db()
    from zuds_tpu.core import DBSession
    cold = sys.argv[1] if len(sys.argv) > 1 else '/tmp/zuds-tpu-cold'
    out = archive_to_cold(DBSession(), cold)
    print(f'archived -> {out}')
