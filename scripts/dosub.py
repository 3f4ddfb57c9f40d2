#!/usr/bin/env python
"""Per-rank subtraction worker (reference: scripts/dosub.py).

Runs the canonical end-to-end chain for each (science, reference) pair in
this rank's share of the work list: load -> subtract -> catalog -> detect +
filter -> stamps -> commit. Work items are lines "scipath refpath".
"""
import sys
import time
import traceback

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work

MAX_DETS = 50  # image-quality guard (reference: scripts/dosub.py:14)


def do_one(line, sub_class=None, ml=True):
    """The canonical chain for one science/reference pair
    (reference: scripts/dosub.py:26-187)."""
    from zuds_tpu.subtraction import SingleEpochSubtraction
    from zuds_tpu.detections import Detection
    from zuds_tpu.thumbnails import Thumbnail
    from zuds_tpu.core import DBSession, record_from_image

    sub_class = sub_class or SingleEpochSubtraction
    parts = line.split()
    sci_path, ref_path = parts[0], parts[1]

    tstart = time.time()
    sci = zuds.ScienceImage.from_file(sci_path)
    ref = zuds.ReferenceImage.from_file(ref_path) \
        if hasattr(zuds.ReferenceImage, 'from_file') else None
    print(f'took {time.time() - tstart:.2f} sec to load {sci.basename}',
          flush=True)

    t0 = time.time()
    sub = sub_class.from_images(sci, ref)
    print(f'took {time.time() - t0:.2f} sec to make {sub.basename}',
          flush=True)

    t0 = time.time()
    cat = sub.catalog
    zuds.filter_sexcat(cat, ml=ml)
    detections = Detection.from_catalog(cat, filter=True)
    print(f'took {time.time() - t0:.2f} sec to detect {len(detections)} '
          f'objects on {sub.basename}', flush=True)

    # image-quality guard: too many candidates = bad subtraction
    if len(detections) > MAX_DETS:
        raise RuntimeError(
            f'{sub.basename}: {len(detections)} detections exceeds '
            f'MAX_DETS={MAX_DETS}; bad image quality')

    sess = DBSession()
    if sess.conn is not None:
        rec = record_from_image(sub, 'sesub')
        rec.target_id = getattr(sci, 'id', None)
        rec.reference_id = getattr(ref, 'id', None)
        sess.add(rec)
        sess.commit()
        for d in detections:
            d.image_id = rec.id
            sess.add(d)
        sess.commit()
        for d in detections:
            for stamp_type, img in [('sub', sub), ('new', sci),
                                    ('ref', ref)]:
                if img is None:
                    continue
                sess.add(Thumbnail.from_detection(d, img,
                                                  stamp_type=stamp_type))
        sess.commit()
    return sub, detections


if __name__ == '__main__':
    work = get_my_share_of_work(sys.argv[1])
    for line in work:
        try:
            do_one(str(line))
        except Exception:
            traceback.print_exc()
            from zuds_tpu.core import DBSession
            DBSession().rollback()
            continue
