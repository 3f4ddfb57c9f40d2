#!/usr/bin/env python
"""Science-coadd (time-bin stack) worker (reference: scripts/dostack.py).

Work lines: "outname binleft binright scipath1 scipath2 ..." — builds one
ScienceCoadd per (partition, time-bin) job.
"""
import sys
import traceback

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work


def do_one(line):
    parts = str(line).split()
    outname, binleft, binright = parts[0], parts[1], parts[2]
    paths = parts[3:]
    images = [zuds.ScienceImage.from_file(p) for p in paths]
    coadd = zuds.ScienceCoadd.from_images(images, outname)
    coadd.binleft = binleft
    coadd.binright = binright
    coadd.header.set('BINLEFT', binleft)
    coadd.header.set('BINRIGHT', binright)
    coadd.save()
    return coadd


if __name__ == '__main__':
    for line in get_my_share_of_work(sys.argv[1]):
        try:
            do_one(line)
        except Exception:
            traceback.print_exc()
            from zuds_tpu.core import DBSession
            DBSession().rollback()
            continue
