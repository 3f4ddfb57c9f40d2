"""End-to-end pipeline slice tests on synthetic ZTF-like frames.

Mirrors the reference's integration tests (zuds/tests/suite/test_sub.py,
test_stack.py) with synthetic fixtures: FITS in -> align -> subtract ->
detect -> photometer -> catalog/stamps out, plus the coadd chain.
"""
import os

import numpy as np
import pytest

from zuds_tpu.fits import Header, HDU, write_fits
from zuds_tpu.wcs import TPVWCS

H = W = 512
SCALE = 1.01 / 3600.0
NSTARS = 60
SEEING_REF = 1.6
SEEING_SCI = 2.3
NOISE = 5.0
SKY = 150.0


def synth_field(rng):
    xs = rng.uniform(30, W - 30, NSTARS)
    ys = rng.uniform(30, H - 30, NSTARS)
    fluxes = rng.uniform(5000, 80000, NSTARS)
    return xs, ys, fluxes


def render_frame(xs, ys, fluxes, seeing_px, rng, transient=None):
    yy, xx = np.mgrid[0:H, 0:W]
    sigma = seeing_px / 2.355
    img = np.full((H, W), SKY, dtype=np.float64)
    for x, y, f in zip(xs, ys, fluxes):
        img += f / (2 * np.pi * sigma ** 2) * np.exp(
            -((xx - x) ** 2 + (yy - y) ** 2) / (2 * sigma ** 2))
    if transient is not None:
        tx, ty, tf = transient
        img += tf / (2 * np.pi * sigma ** 2) * np.exp(
            -((xx - tx) ** 2 + (yy - ty) ** 2) / (2 * sigma ** 2))
    img += rng.normal(0, NOISE, (H, W))
    return img.astype('f4')


def write_frame(path, data, wcs, mjd, magzp=26.3, seeing_px=None, field=679,
                ccdid=1, qid=2, fid=2):
    h = Header()
    wcs.to_header(h)
    h.set('MAGZP', magzp)
    h.set('OBSMJD', mjd)
    h.set('OBSJD', mjd + 2400000.5)
    h.set('FIELDID', field)
    h.set('CCDID', ccdid)
    h.set('QID', qid)
    h.set('FILTERID', fid)
    h.set('SATURATE', 60000.0)
    h.set('FILENAME', f'ztf_20180815000000_{field:06d}_zr_c01_o_q{qid}_'
                      f'sciimg.fits')
    if seeing_px:
        h.set('SEEING', seeing_px)
    write_fits(path, [HDU(h, data)])
    # sibling mask
    mask = np.zeros(data.shape, dtype=np.uint16)
    hm = h.copy()
    write_fits(str(path).replace('sciimg', 'mskimg'), [HDU(hm, mask)])


@pytest.fixture(scope='module')
def frame_dir(tmp_path_factory):
    rng = np.random.default_rng(42)
    d = tmp_path_factory.mktemp('frames')
    xs, ys, fluxes = synth_field(rng)
    wcs_sci = TPVWCS.simple(crval=(150.1, 35.2),
                            crpix=(W / 2 + 0.5, H / 2 + 0.5),
                            scale_deg=SCALE)
    # ref frame is dithered by ~4px and slightly rotated
    wcs_ref = TPVWCS.simple(crval=(150.1, 35.2),
                            crpix=(W / 2 + 4.6, H / 2 - 3.2),
                            scale_deg=SCALE, rot_deg=0.03)
    # render the ref off the same sky: star pixel coords in ref frame
    ra, dec = wcs_sci.pix2sky_0(xs, ys)
    rx, ry = wcs_ref.sky2pix_0(ra, dec)

    sci = render_frame(xs, ys, fluxes, SEEING_SCI, rng,
                       transient=(130.25, 140.75, 30000.0))
    ref = render_frame(rx, ry, fluxes, SEEING_REF, rng)

    write_frame(d / 'ztf_sci_679_sciimg.fits', sci, wcs_sci, 58345.25,
                seeing_px=SEEING_SCI)
    write_frame(d / 'ztf_ref_679_sciimg.fits', ref, wcs_ref, 58300.00,
                seeing_px=SEEING_REF)
    # truth for assertions
    np.save(d / 'truth.npy',
            np.array([130.25, 140.75, 30000.0]))
    np.save(d / 'stars.npy', np.stack([xs, ys, fluxes]))
    return d


@pytest.fixture(scope='module')
def sci_ref(frame_dir):
    from zuds_tpu.image import ScienceImage
    sci = ScienceImage.from_file(str(frame_dir / 'ztf_sci_679_sciimg.fits'))
    ref = ScienceImage.from_file(str(frame_dir / 'ztf_ref_679_sciimg.fits'))
    return sci, ref


def test_science_image_reflection(sci_ref):
    sci, _ = sci_ref
    assert sci.field == 679
    assert sci.qid == 2
    assert sci.fid == 2
    assert sci.filtercode == 'zr'
    assert sci.mask_image is not None
    assert sci.header['SEEING'] == SEEING_SCI
    assert sci.ra == pytest.approx(150.1, abs=1e-6)


def test_calibration_products(sci_ref):
    sci, _ = sci_ref
    bkg = np.asarray(sci.background_image.data)
    assert np.median(bkg) == pytest.approx(SKY, abs=2.0)
    rms = np.asarray(sci.rms_image.data)
    assert np.median(rms) == pytest.approx(NOISE, rel=0.15)
    wgt = np.asarray(sci.weight_image.data)
    assert np.median(wgt) == pytest.approx(1 / NOISE ** 2, rel=0.3)
    # products are written as siblings
    assert os.path.exists(sci.local_path.replace('.fits', '.rms.fits'))


def test_catalog_and_seeing(sci_ref):
    sci, _ = sci_ref
    cat = sci.catalog
    assert len(cat) >= 30
    from zuds_tpu.seeing import estimate_seeing
    seeing = estimate_seeing(sci)
    assert seeing == pytest.approx(SEEING_SCI, rel=0.15)


def test_alignment(sci_ref):
    sci, ref = sci_ref
    remapped = ref.aligned_to(sci)
    assert remapped.data.shape == sci.data.shape
    # a bright star lands at the same pixel in both frames after alignment
    stars = np.load(os.path.join(os.path.dirname(sci.local_path),
                                 'stars.npy'))
    xs, ys, fluxes = stars
    i = np.argmax(fluxes)
    x, y = int(round(xs[i])), int(round(ys[i]))
    box_s = np.asarray(sci.data)[y - 4:y + 5, x - 4:x + 5]
    box_r = np.asarray(remapped.data)[y - 4:y + 5, x - 4:x + 5]
    cy_s, cx_s = np.unravel_index(np.argmax(box_s), box_s.shape)
    cy_r, cx_r = np.unravel_index(np.argmax(box_r), box_r.shape)
    assert abs(cy_s - cy_r) <= 1 and abs(cx_s - cx_r) <= 1


@pytest.fixture(scope='module')
def subtraction(sci_ref):
    from zuds_tpu.subtraction import SingleEpochSubtraction
    sci, ref = sci_ref
    return SingleEpochSubtraction.from_images(sci, ref, nreg_side=1,
                                              spatial_order=1)


def test_subtraction_products(subtraction, frame_dir):
    sub = subtraction
    assert sub.basename.startswith('sub.')
    assert os.path.exists(sub.local_path)
    assert sub.mask_image is not None
    d = np.asarray(sub.data)
    # stars cancel: central region residual rms ~ combined noise
    inner = d[32:-32, 32:-32]
    sig = 1.4826 * np.median(np.abs(inner - np.median(inner)))
    assert sig < 2.5 * NOISE


def test_transient_recovered(subtraction, frame_dir):
    truth = np.load(frame_dir / 'truth.npy')
    tx, ty, tf = truth
    d = np.asarray(subtraction.data)
    box = d[int(ty) - 7:int(ty) + 8, int(tx) - 7:int(tx) + 8]
    assert box.sum() == pytest.approx(tf, rel=0.15)


def test_detection_chain(subtraction, frame_dir):
    from zuds_tpu.filterobjects import filter_sexcat
    from zuds_tpu.detections import Detection
    cat = subtraction.catalog
    filter_sexcat(cat, ml=False)
    dets = Detection.from_catalog(cat, filter=True)
    assert len(dets) >= 1
    truth = np.load(frame_dir / 'truth.npy')
    ra_t, dec_t = subtraction.wcs.pix2sky_0(truth[0], truth[1])
    seps = [np.hypot((d.ra - ra_t) * np.cos(np.radians(dec_t)) * 3600,
                     (d.dec - dec_t) * 3600) for d in dets]
    assert min(seps) < 1.5


def test_forced_photometry(subtraction, frame_dir):
    truth = np.load(frame_dir / 'truth.npy')
    ra_t, dec_t = subtraction.wcs.pix2sky_0(truth[0], truth[1])
    from zuds_tpu.photometry import aperture_photometry
    res = aperture_photometry(subtraction, [float(ra_t)], [float(dec_t)],
                              assume_background_subtracted=True)
    # r=3px aperture captures the expected PSF fraction of the transient
    sigma = SEEING_SCI / 2.355
    frac = 1 - np.exp(-9.0 / (2 * sigma ** 2))
    assert res['flux'][0] == pytest.approx(truth[2] * frac, rel=0.15)


def test_zogy_path(sci_ref, frame_dir):
    from zuds_tpu.subtraction import SingleEpochSubtraction
    sci, ref = sci_ref
    sub = SingleEpochSubtraction.from_images(sci, ref, method='zogy')
    truth = np.load(frame_dir / 'truth.npy')
    s = np.asarray(sub.scorr_image.data)
    ty, tx = int(truth[1]), int(truth[0])
    # transient is a strong peak in the score image
    assert s[ty - 2:ty + 3, tx - 2:tx + 3].max() > 10.0


def test_coadd_chain(frame_dir, sci_ref):
    """Several dithered epochs -> ReferenceImage.from_images."""
    from zuds_tpu.image import ScienceImage
    from zuds_tpu.coadd import ReferenceImage

    rng = np.random.default_rng(7)
    stars = np.load(frame_dir / 'stars.npy')
    xs, ys, fluxes = stars
    base = TPVWCS.simple(crval=(150.1, 35.2),
                         crpix=(W / 2 + 0.5, H / 2 + 0.5), scale_deg=SCALE)
    ra, dec = base.pix2sky_0(xs, ys)
    epochs = []
    for i in range(4):
        wcs_i = TPVWCS.simple(
            crval=(150.1, 35.2),
            crpix=(W / 2 + 0.5 + rng.uniform(-3, 3),
                   H / 2 + 0.5 + rng.uniform(-3, 3)),
            scale_deg=SCALE)
        ex, ey = wcs_i.sky2pix_0(ra, dec)
        img = render_frame(ex, ey, fluxes, 2.0, rng)
        path = frame_dir / f'ztf_epoch{i}_679_sciimg.fits'
        write_frame(str(path), img, wcs_i, 58340.0 + i, magzp=26.0,
                    seeing_px=2.0)
        epochs.append(ScienceImage.from_file(str(path)))

    out = str(frame_dir / 'ref.coadd.fits')
    coadd = ReferenceImage.from_images(epochs, out)
    assert os.path.exists(out)
    assert coadd.header['MAGZP'] == 25.0
    assert coadd.header['NCOADD'] == 4
    assert coadd.header['MJD-OBS'] == pytest.approx(58341.5)
    # the coadd is deeper: noise drops roughly as sqrt(N x flxscale stuff)
    inner = np.asarray(coadd.data)[128:-128, 128:-128]
    sig = 1.4826 * np.median(np.abs(inner - np.median(inner)))
    single = NOISE * 10 ** (-0.4 * (26.0 - 25.0))
    assert sig < single / np.sqrt(3)
    # bright-star photometry is preserved through FLXSCALE normalization:
    # epoch counts at MAGZP 26 scale by 10**(-0.4*(26-25)) into the ZP-25
    # coadd frame
    from zuds_tpu.photometry import aperture_photometry
    i = np.argmax(fluxes)
    res = aperture_photometry(coadd, [float(ra[i])], [float(dec[i])])
    sigma = 2.0 / 2.355
    frac = 1 - np.exp(-9.0 / (2 * sigma ** 2))
    expect = fluxes[i] * frac * 10 ** (-0.4 * (26.0 - 25.0))
    assert res['flux'][0] == pytest.approx(expect, rel=0.1)


def test_db_roundtrip(tmp_path, tmp_config):
    """init_db -> persist a detection + job -> query back."""
    import zuds_tpu.model_util as mu
    from zuds_tpu.core import DBSession, ZTFFile
    from zuds_tpu.bookkeeping import Job
    from zuds_tpu.detections import Detection

    mu.init_db(database=str(tmp_path / 'test.db'))
    mu.create_tables()
    sess = DBSession()
    sess.add(ZTFFile(type='sci', basename='ztf_x_sciimg.fits', field=679,
                     ccdid=1, qid=2, fid=2, ra=150.1, dec=35.2))
    sess.add(Job(status='processing', slurm_id='123'))
    sess.add(Detection(ra=150.1, dec=35.2, flux_aper=100.0,
                       fluxerr_aper=10.0, goodcut=1))
    sess.commit()

    got = ZTFFile.get_by_basename('ztf_x_sciimg.fits')
    assert got is not None
    assert got.field == 679
    assert sess.query(Job).filter_by(status='processing').count() == 1
    # spatial cone query through the q3c-equivalent layer
    from zuds_tpu.spatial import cone_where
    where, params = cone_where(150.1, 35.2, 1.0 / 3600)
    hits = sess.query(Detection).filter(where, *params).all()
    assert len(hits) == 1
    DBSession.remove()


def test_multi_epoch_subtraction(frame_dir, sci_ref):
    """coadd -> 2x single-epoch subs -> multi-epoch sub, end-to-end
    (the reference's test_multi_epoch_sub shape, test_sub.py:40-64)."""
    from zuds_tpu.image import ScienceImage
    from zuds_tpu.coadd import ScienceCoadd
    from zuds_tpu.subtraction import (SingleEpochSubtraction,
                                      MultiEpochSubtraction)
    _, ref = sci_ref
    epochs = [ScienceImage.from_file(str(frame_dir / f'ztf_epoch{i}_679_'
                                         f'sciimg.fits')) for i in range(2)]
    subs = []
    for e in epochs:
        subs.append(SingleEpochSubtraction.from_images(e, ref, nreg_side=1,
                                                       spatial_order=0))
    stack = ScienceCoadd.from_images(epochs,
                                     str(frame_dir / 'scistack.fits'))
    stack.binleft = '58340.0'
    stack.binright = '58347.0'
    mesub = MultiEpochSubtraction.from_images(stack, ref,
                                              input_subtractions=subs)
    assert mesub.basename.startswith('sub.')
    assert mesub.header['SEEING'] == stack.header['SEEING']
    d = np.asarray(mesub.data)
    assert d.shape[0] >= H  # union grid covers the quadrant
    inner = d[64:-64, 64:-64]
    sig = 1.4826 * np.median(np.abs(inner - np.median(inner)))
    # stars cancel; stacked sub noise is below single-epoch noise
    assert sig < 2.0 * NOISE
    assert mesub.reference_image is ref
    assert mesub.target_image is stack
