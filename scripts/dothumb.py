#!/usr/bin/env python
"""Thumbnail persistence worker (reference: scripts/dothumb.py): render
unpersisted DB thumbnails to the public web directory, in batches."""
import sys
import traceback

BATCH = 50


def main():
    import zuds_tpu
    zuds_tpu.init_db()
    from zuds_tpu.core import DBSession
    from zuds_tpu.thumbnails import Thumbnail
    sess = DBSession()
    while True:
        rows = sess.query(Thumbnail).filter('file_uri IS NULL') \
            .limit(BATCH).all()
        if not rows:
            break
        for t in rows:
            try:
                t.persist()
                sess.add(t)
            except Exception:
                traceback.print_exc()
        sess.commit()
        print(f'persisted {len(rows)} thumbnails', flush=True)


if __name__ == '__main__':
    main()
