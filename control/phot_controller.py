#!/usr/bin/env python
"""Forced-photometry + alert chain daemon (reference: nersc/phot_controller.py).

Loop: find subtractions with unphotometered sources, write a work list,
launch a dophot job (slurm fan-out of 13 nodes x 64 ranks in the reference;
local pool otherwise), bulk-load the merged CSV, flag detections
``alert_ready``, and launch alert jobs. The reference's 16-19 UTC gating is
kept behind a flag.
"""
from __future__ import annotations

import datetime
import os
import subprocess
import sys
import time

POLL_S = 60


def in_time_window(gate=False):
    """Reference gates photometry jobs to 16-19 UTC
    (phot_controller.py:241-243)."""
    if not gate:
        return True
    hour = datetime.datetime.utcnow().hour
    return 16 <= hour < 19


def pending_subtractions(session, limit=1_000_000):
    rows = session.execute(
        'SELECT DISTINCT z.basename FROM ztffiles z, sources s '
        'WHERE z.type IN ("sesub", "mesub") AND NOT EXISTS ('
        '  SELECT 1 FROM forcedphotometry fp WHERE fp.image_id = z.id '
        '  AND fp.source_id = s.id) LIMIT ?', (limit,)).fetchall()
    return [r[0] for r in rows]


def run_phot_job(worklist_path, outdir):
    from scripts import dophot  # noqa: F401  (module path when installed)
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(__file__), '..', 'scripts',
                                 'dophot.py'), worklist_path, outdir],
                   check=True)
    return os.path.join(outdir, 'phot.all.csv')


def load_output(session, csv_path):
    """Bulk-load + flag alert-ready detections
    (reference phot_controller.py:64-89)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'scripts'))
    from loadphot import load
    n = load(csv_path)
    session.execute(
        'UPDATE detections SET alert_ready = 1 WHERE triggers_alert = 1 '
        'AND source_id IS NOT NULL AND alert_ready IS NULL')
    session.conn.commit()
    return n


def main(workdir='/tmp/zuds-tpu-phot', once=False, gate_hours=False):
    import zuds_tpu
    zuds_tpu.init_db()
    from zuds_tpu.core import DBSession
    from zuds_tpu.bookkeeping import ForcePhotJob
    os.makedirs(workdir, exist_ok=True)
    while True:
        if in_time_window(gate_hours):
            sess = DBSession()
            subs = pending_subtractions(sess)
            if subs:
                path = os.path.join(workdir, f'phot_{int(time.time())}.txt')
                with open(path, 'w') as f:
                    f.write('\n'.join(subs) + '\n')
                job = ForcePhotJob(status='running', detection_file=path)
                sess.add(job)
                sess.commit()
                try:
                    csv_path = run_phot_job(path, workdir)
                    n = load_output(sess, csv_path)
                    job.status = 'done'
                    job.output_file = csv_path
                    print(f'photometered {n} measurements', flush=True)
                except Exception:
                    import traceback
                    traceback.print_exc()
                    job.status = 'error'
                sess.add(job)
                sess.commit()
        if once:
            break
        time.sleep(POLL_S)


if __name__ == '__main__':
    main(once='--once' in sys.argv)
