#!/usr/bin/env python
"""Alert worker: build + publish alerts for detection ids
(reference: scripts/doalert.py)."""
import sys
import traceback

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work


def do_one(detection_id):
    from zuds_tpu.core import DBSession
    from zuds_tpu.detections import Detection
    sess = DBSession()
    det = sess.query(Detection).get(int(detection_id))
    if det is None:
        raise ValueError(f'no detection {detection_id}')
    alert = zuds.Alert.from_detection(det)
    sess.add(alert)
    sess.commit()
    zuds.send_alert(alert)
    return alert


if __name__ == '__main__':
    import zuds_tpu
    zuds_tpu.init_db()
    for det_id in get_my_share_of_work(sys.argv[1]):
        try:
            do_one(det_id)
        except Exception:
            traceback.print_exc()
            from zuds_tpu.core import DBSession
            DBSession().rollback()
            continue
