#!/usr/bin/env python
"""Reference-image build worker (reference: scripts/makeref.py).

Each work line is "outname scipath1 scipath2 ...". Epochs are quality-cut
(seeing 1.7-2.5", maglimit 19.2-22, infobits 0; reference makeref.py:58-81),
the best <=50 by maglimit are kept, and at least MIN_IMAGES must survive.
"""
import sys
import traceback

import numpy as np

import zuds_tpu as zuds
from zuds_tpu.mpi import get_my_share_of_work

MIN_IMAGES = 14
MAX_IMAGES = 50
SEEING_RANGE_ARCSEC = (1.7, 2.5)
MAGLIM_RANGE = (19.2, 22.0)


def quality_cut(images):
    good = []
    for im in images:
        seeing_px = im.header.get('SEEING')
        maglim = im.header.get('MAGLIM')
        infobits = im.header.get('INFOBITS', 0)
        if seeing_px is None or maglim is None:
            continue
        seeing_arcsec = seeing_px * im.pixel_scale
        if not (SEEING_RANGE_ARCSEC[0] <= seeing_arcsec
                <= SEEING_RANGE_ARCSEC[1]):
            continue
        if not (MAGLIM_RANGE[0] <= maglim <= MAGLIM_RANGE[1]):
            continue
        if infobits != 0:
            continue
        good.append(im)
    good.sort(key=lambda im: -im.header['MAGLIM'])   # deepest first
    return good[:MAX_IMAGES]


def do_one(line, enforce_cuts=True):
    parts = str(line).split()
    outname, paths = parts[0], parts[1:]
    images = [zuds.ScienceImage.from_file(p) for p in paths]
    if enforce_cuts:
        images = quality_cut(images)
    if len(images) < MIN_IMAGES:
        raise RuntimeError(
            f'{outname}: only {len(images)} epochs survive quality cuts '
            f'(need >= {MIN_IMAGES})')
    ref = zuds.ReferenceImage.from_images(images, outname)
    return ref


if __name__ == '__main__':
    for line in get_my_share_of_work(sys.argv[1]):
        try:
            do_one(line)
        except Exception:
            traceback.print_exc()
            from zuds_tpu.core import DBSession
            DBSession().rollback()
            continue
