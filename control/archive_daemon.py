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


def media_locator(paths):
    """Physical-position locator for each archive path: the sort key that
    makes sequential-media retrieval monotone.

    The reference asks HPSS where every tarball physically lives
    (``hsi ls -P`` -> (tape, position), nersc/retrieve.py:20-68) and
    orders restores by it — THE optimization of that module: random tape
    recalls thrash the robot and rewind constantly. Here:

    * when ``hsi`` exists, the same ``ls -P`` parse (FILE lines carry
      position field 5 as 'pos+offset' and tape field 6);
    * otherwise a filesystem proxy: (device, inode) — monotone inode
      order approximates allocation order on the cold tier's disk.

    Returns {path: (tape, position)} — missing paths are absent.
    """
    import shutil
    import subprocess
    out = {}
    hsi = shutil.which('hsi')
    if hsi:
        try:
            cmds = '\n'.join(f'ls -P {p}' for p in paths) + '\n'
            r = subprocess.run([hsi, 'in', '/dev/stdin'], input=cmds,
                               capture_output=True, text=True, timeout=600)
            # 64 = some files missing; acceptable (reference retrieve.py)
            if r.returncode in (0, 64):
                for line in (r.stdout or '').splitlines():
                    parts = line.split()
                    # FILE <path> <a> <b> <pos+off> <tape> ...
                    if len(parts) >= 6 and parts[0] == 'FILE':
                        pos = parts[4].split('+')[0]
                        tape = parts[5][:-2] if len(parts[5]) > 2 \
                            else parts[5]
                        try:
                            pos = int(pos)
                        except ValueError:
                            pass
                        out[parts[1]] = (tape, pos)
                if out:
                    return out
        except (OSError, subprocess.SubprocessError):
            pass
    for p in paths:
        try:
            st = os.stat(p)
            out[p] = (str(st.st_dev), st.st_ino)
        except OSError:
            continue
    return out


def retrieve_from_cold(session, basenames, cold_dir, dest_dir):
    """Pull products back from cold tarballs: grouped per tarball so each
    archive is read once, and tarballs restored in PHYSICAL MEDIA ORDER
    (the reference's hsi ls -P tape-position sort,
    nersc/retrieve.py:20-180) — random recall order is the dominant cost
    on sequential media."""
    from collections import defaultdict
    by_tar = defaultdict(list)
    for basename in basenames:
        row = session.execute(
            'SELECT tarname FROM tapecopies WHERE member_name = ? '
            'ORDER BY id DESC LIMIT 1', (basename,)).fetchone()
        if row:
            by_tar[row[0]].append(basename)
    os.makedirs(dest_dir, exist_ok=True)
    paths = {t: os.path.join(cold_dir, t) for t in by_tar}
    loc = media_locator([p for p in paths.values() if os.path.exists(p)])
    ordered = sorted(by_tar.items(),
                     key=lambda kv: loc.get(paths[kv[0]], ('~', 1 << 62)))
    restored = []
    for tarname, members in ordered:
        path = paths[tarname]
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
