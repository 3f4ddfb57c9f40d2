#!/usr/bin/env python
"""Nightly single-epoch subtraction wrapper (reference: scripts/donightly.py):
runs dosub.do_one per work item, recording FailedSubtraction rows so bad
pairs are never re-queued."""
import sys
import traceback

from zuds_tpu.mpi import get_my_share_of_work
from dosub import do_one


def main(worklist):
    from zuds_tpu.core import DBSession
    from zuds_tpu.bookkeeping import FailedSubtraction
    for line in get_my_share_of_work(worklist):
        try:
            do_one(str(line))
        except Exception as e:
            traceback.print_exc()
            sess = DBSession()
            sess.rollback()
            if sess.conn is not None:
                sess.add(FailedSubtraction(reason=str(e)[:500]))
                sess.commit()
            continue


if __name__ == '__main__':
    main(sys.argv[1])
