#!/usr/bin/env python
"""Alert backfill (reference: scripts/makealert.py): build Alert rows for
every alert-ready detection lacking one, without publishing."""
import traceback

import zuds_tpu as zuds


def main():
    zuds.init_db()
    from zuds_tpu.core import DBSession
    from zuds_tpu.detections import Detection
    sess = DBSession()
    rows = sess.execute(
        'SELECT d.id FROM detections d WHERE d.alert_ready = 1 AND NOT '
        'EXISTS (SELECT 1 FROM alerts a WHERE a.detection_id = d.id)'
    ).fetchall()
    for (det_id,) in rows:
        try:
            det = sess.query(Detection).get(det_id)
            alert = zuds.Alert.from_detection(det)
            sess.add(alert)
            sess.commit()
        except Exception:
            traceback.print_exc()
            sess.rollback()


if __name__ == '__main__':
    main()
