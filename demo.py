#!/usr/bin/env python
"""Demo: the full ZUDS chain on synthetic ZTF-like data (the reference
ships demo.ipynb; this is the equivalent runnable walkthrough).

    python demo.py [workdir]

Builds a reference coadd from dithered epochs, subtracts a science epoch
containing an injected transient, detects + filters candidates, runs forced
photometry, persists records, and spools an Avro alert.
"""
import os
import sys

import numpy as np


def make_night(workdir, H=512, W=512, nepochs=5):
    from zuds_tpu.fits import Header, HDU, write_fits
    from zuds_tpu.wcs import TPVWCS
    rng = np.random.default_rng(7)
    scale = 1.01 / 3600.0
    xs = rng.uniform(30, W - 30, 50)
    ys = rng.uniform(30, H - 30, 50)
    fl = rng.uniform(8000, 60000, 50)
    base = TPVWCS.simple(crval=(150.1, 35.2), crpix=(W / 2, H / 2),
                         scale_deg=scale)
    ra, dec = base.pix2sky_0(xs, ys)

    def render(exs, eys, seeing, transient=None):
        yy, xx = np.mgrid[0:H, 0:W]
        sig = seeing / 2.355
        img = np.full((H, W), 150.0)
        for x, y, f in zip(exs, eys, fl):
            img += f / (2 * np.pi * sig ** 2) * np.exp(
                -((xx - x) ** 2 + (yy - y) ** 2) / (2 * sig ** 2))
        if transient:
            tx, ty, tf = transient
            img += tf / (2 * np.pi * sig ** 2) * np.exp(
                -((xx - tx) ** 2 + (yy - ty) ** 2) / (2 * sig ** 2))
        return (img + rng.normal(0, 5.0, (H, W))).astype('f4')

    def write(path, data, wcs, mjd, seeing):
        h = Header()
        wcs.to_header(h)
        for k, v in [('MAGZP', 26.0), ('OBSMJD', mjd),
                     ('OBSJD', mjd + 2400000.5), ('FIELDID', 679),
                     ('CCDID', 1), ('QID', 2), ('FILTERID', 2),
                     ('SATURATE', 60000.0), ('SEEING', seeing),
                     ('FILENAME',
                      'ztf_20180815000000_000679_zr_c01_o_q2_sciimg.fits')]:
            h.set(k, v)
        write_fits(path, [HDU(h, data)])
        write_fits(path.replace('sciimg', 'mskimg'),
                   [HDU(h.copy(), np.zeros(data.shape, np.int16))])

    epochs = []
    for i in range(nepochs):
        w = TPVWCS.simple(crval=(150.1, 35.2),
                          crpix=(W / 2 + rng.uniform(-4, 4),
                                 H / 2 + rng.uniform(-4, 4)),
                          scale_deg=scale)
        ex, ey = w.sky2pix_0(ra, dec)
        p = os.path.join(workdir, f'ztf_e{i}_679_sciimg.fits')
        write(p, render(ex, ey, 1.8), w, 58300.0 + i, 1.8)
        epochs.append(p)
    wsci = TPVWCS.simple(crval=(150.1, 35.2), crpix=(W / 2, H / 2),
                         scale_deg=scale)
    sx, sy = wsci.sky2pix_0(ra, dec)
    sci_path = os.path.join(workdir, 'ztf_sci_679_sciimg.fits')
    write(sci_path, render(sx, sy, 2.4, transient=(130.3, 141.7, 25000.0)),
          wsci, 58345.25, 2.4)
    return epochs, sci_path


def main(workdir='/tmp/zuds-tpu-demo'):
    os.makedirs(workdir, exist_ok=True)
    os.environ.setdefault('ZUDS_CONFIG', os.path.join(workdir, 'config.yaml'))

    import zuds_tpu as zuds
    from zuds_tpu.status import status

    with status('synthesizing a night of ZTF-like quadrant frames'):
        epoch_paths, sci_path = make_night(workdir)

    with status('loading epochs'):
        epochs = [zuds.ScienceImage.from_file(p) for p in epoch_paths]
        sci = zuds.ScienceImage.from_file(sci_path)

    with status('building the reference coadd (Lanczos warp + CLIPPED)'):
        ref = zuds.ReferenceImage.from_images(
            epochs, os.path.join(workdir, 'ref.fits'))
    print(f'  reference: {ref.basename}, seeing '
          f'{ref.header["SEEING"]:.2f} px, ZP {ref.header["MAGZP"]}')

    with status('PSF-matching subtraction (A&L device kernel)'):
        sub = zuds.SingleEpochSubtraction.from_images(sci, ref, nreg_side=1,
                                                      spatial_order=1)

    with status('detect + quality filter'):
        cat = sub.catalog
        zuds.filter_sexcat(cat, ml=False)
        dets = zuds.Detection.from_catalog(cat, filter=True)
    print(f'  {len(dets)} candidates survive the funnel')

    with status('forced photometry at the transient'):
        ra_t, dec_t = sub.wcs.pix2sky_0(130.3, 141.7)
        res = zuds.aperture_photometry(sub, [float(ra_t)], [float(dec_t)],
                                       assume_background_subtracted=True)
    print(f'  flux {res["flux"][0]:.0f} +- {res["fluxerr"][0]:.0f} '
          f'(injected 25000 x aperture fraction)')

    with status('persisting to the DB + spooling an Avro alert'):
        zuds.init_db(database=os.path.join(workdir, 'demo.db'))
        zuds.create_tables()
        sess = zuds.DBSession()
        from zuds_tpu.core import record_from_image
        rec = record_from_image(sub, 'sesub')
        sess.add(rec)
        sess.commit()
        if dets:
            det = dets[0]
            det.image_id = rec.id
            sess.add(det)
            sess.commit()
            alert = zuds.Alert.from_detection(det)
            topic = zuds.send_alert(alert)
            print(f'  alert spooled to topic {topic}')

    print('\ndemo complete; products in', workdir)


if __name__ == '__main__':
    main(*sys.argv[1:])
