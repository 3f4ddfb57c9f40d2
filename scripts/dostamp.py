#!/usr/bin/env python
"""Best-detection stamp worker (reference: scripts/dostamp.py): render
thumbnails for each source's best detection."""
import sys
import traceback

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work


def do_one(source_id):
    from zuds_tpu.core import DBSession
    from zuds_tpu.source import Source
    from zuds_tpu.thumbnails import Thumbnail
    sess = DBSession()
    src = sess.query(Source).filter_by(id=str(source_id)).first()
    if src is None:
        raise ValueError(f'no source {source_id}')
    best = src.best_detection
    if best is None:
        return None
    image = getattr(best, 'image', None)
    if image is None:
        return None
    t = Thumbnail.from_detection(best, image)
    t.source_id = src.id
    sess.add(t)
    sess.commit()
    return t


if __name__ == '__main__':
    zuds.init_db()
    for sid in get_my_share_of_work(sys.argv[1]):
        try:
            do_one(sid)
        except Exception:
            traceback.print_exc()
            from zuds_tpu.core import DBSession
            DBSession().rollback()
            continue
