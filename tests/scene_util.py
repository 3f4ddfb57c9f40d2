"""Realistic synthetic ZTF scene generator for robustness tests.

The reference validates subtraction/detection against *real ZTF pixels*
(golden stamps through swarp/hotpants,
``/root/reference/zuds/tests/suite/test_sub.py:9-37``). Real pixels are
unreachable offline; this builds the closest synthetic stand-in — a
quadrant-style scene with everything that made round 3's production bug
invisible to the isolated-Gaussian fixtures (VERDICT r3 missing #2):

* a spatially varying sky background (gradient + vignetting bowl),
* a power-law star population dense enough to stress the detect
  compaction capacities,
* Sersic-profile galaxies (n = 1..4, elliptical, rotated),
* cosmic rays in the science frame only (sharp, un-PSF-ed streaks),
* a real-pattern mask plane: dead columns, hot pixels, and saturation
  bleeds around the brightest stars,
* a planted transient of known flux/position.

Science and reference share the sky (same stars/galaxies) but differ in
seeing, WCS dither, noise realization, cosmic rays, and the transient —
exactly the structure of a real single-epoch subtraction pair.
"""
import numpy as np

from zuds_tpu.wcs import TPVWCS
from zuds_tpu.fits import Header, HDU, write_fits

__all__ = ['render_scene_pair', 'write_scene_pair']


def _gaussian_stars(img, xs, ys, fluxes, sigma):
    k = max(6, int(np.ceil(4 * sigma)))
    yy, xx = np.mgrid[-k:k + 1, -k:k + 1]
    H, W = img.shape
    for x, y, f in zip(xs, ys, fluxes):
        xi, yi = int(round(x)), int(round(y))
        if not (k < xi < W - k - 1 and k < yi < H - k - 1):
            continue
        psf = np.exp(-((xx + xi - x) ** 2 + (yy + yi - y) ** 2)
                     / (2 * sigma * sigma)) / (2 * np.pi * sigma * sigma)
        img[yi - k:yi + k + 1, xi - k:xi + k + 1] += (f * psf).astype('f4')


def _sersic_galaxies(img, xs, ys, fluxes, re, n_ser, q, pa, psf_sigma):
    """Render Sersic blobs EXACTLY convolved with the Gaussian PSF.

    The science and reference frames must be related by a true
    convolution (sci = k * ref) for a PSF-matching kernel to exist — an
    approximate profile (e.g. quadrature-widened r_e) leaves a misfit
    footprint on every galaxy that no kernel can remove, which floods
    the subtraction with low-level structure (r4 diagnosis: 5.6% of the
    frame above threshold)."""
    from scipy.signal import fftconvolve
    H, W = img.shape
    # SUPERSAMPLED rendering: the raw Sersic cusp is not band-limited, so
    # sampling it at pixel centers makes the discrete sci/ref profiles
    # differ by more than a convolution whenever their subpixel phases
    # differ (the frames are dithered) — leaving kernel-unfittable core
    # residuals on every galaxy. Render base profile and PSF at 4x,
    # convolve, then bin: both frames then sample the SAME continuous
    # (well-resolved after PSF) function.
    S = 4
    kk = max(3, int(np.ceil(4 * psf_sigma)))
    ps = psf_sigma * S
    pk = kk * S
    pyy, pxx = np.mgrid[-pk:pk + 1, -pk:pk + 1]
    psf = np.exp(-(pxx ** 2 + pyy ** 2) / (2 * ps * ps))
    psf /= psf.sum()
    # b_n approximation (Ciotti & Bertin 1999)
    for x, y, f, r, n, qq, th in zip(xs, ys, fluxes, re, n_ser, q, pa):
        bn = 2 * n - 1.0 / 3.0 + 4.0 / (405 * n)
        k = int(np.ceil(6 * r)) + 2 + kk
        xi, yi = int(round(x)), int(round(y))
        if not (k < xi < W - k - 1 and k < yi < H - k - 1):
            continue
        # supersampled grid centered on the stamp: sample point (a, b)
        # sits at pixel offset (a + 0.5)/S - 0.5 - k from the stamp corner
        m = (2 * k + 1) * S
        ax = (np.arange(m, dtype='f8') + 0.5) / S - 0.5 - k
        dx = ax[None, :] + xi - x
        dy = ax[:, None] + yi - y
        ct, st = np.cos(th), np.sin(th)
        xr = dx * ct + dy * st
        yr = -dx * st + dy * ct
        rr = np.sqrt(xr ** 2 + (yr / qq) ** 2) / r
        prof = np.exp(-bn * (np.maximum(rr, 1e-6) ** (1.0 / n) - 1.0))
        prof = prof / prof.sum() * f
        sup = fftconvolve(prof, psf, mode='same')
        stamp = sup.reshape(2 * k + 1, S, 2 * k + 1, S).sum(axis=(1, 3))
        img[yi - k:yi + k + 1, xi - k:xi + k + 1] += stamp.astype('f4')


def _cosmic_rays(img, rng, n=40, flux=(2000., 20000.)):
    """Sharp 1px-wide streaks, 2-12 px long — no PSF convolution."""
    H, W = img.shape
    hits = []
    for _ in range(n):
        x0 = rng.uniform(30, W - 30)
        y0 = rng.uniform(30, H - 30)
        length = rng.uniform(2, 12)
        ang = rng.uniform(0, np.pi)
        f = rng.uniform(*flux)
        npts = max(2, int(length * 2))
        ts = np.linspace(0, length, npts)
        xs = np.clip(np.round(x0 + ts * np.cos(ang)).astype(int), 0, W - 1)
        ys = np.clip(np.round(y0 + ts * np.sin(ang)).astype(int), 0, H - 1)
        for x, y in zip(xs, ys):
            img[y, x] += f / npts
        hits.append((x0, y0))
    return np.array(hits)


def render_scene_pair(H, W, seed=11, nstars=1500, ngal=300, ncr=40,
                      transient=None, seeing_ref=2.0, seeing_sci=2.8,
                      dither=(2.1, -1.7), sat_level=60000.0):
    """Render (sci, sci_mask, ref, ref_mask, wcs_sci, wcs_ref, truth).

    ``transient``: (x, y, flux) in science pixel coords, or None.
    ``truth`` dict carries star/galaxy/CR positions for assertions.
    """
    rng = np.random.default_rng(seed)
    scale = 1.01 / 3600.0
    wcs_sci = TPVWCS.simple(crval=(150.1, 35.2),
                            crpix=(W / 2 + 0.5, H / 2 + 0.5),
                            scale_deg=scale)
    wcs_ref = TPVWCS.simple(crval=(150.1, 35.2),
                            crpix=(W / 2 + 0.5 + dither[0],
                                   H / 2 + 0.5 + dither[1]),
                            scale_deg=scale)

    # --- shared sky content in science pixel coordinates -------------------
    sx = rng.uniform(25, W - 25, nstars)
    sy = rng.uniform(25, H - 25, nstars)
    # power-law flux distribution: many faint, a few very bright
    sflux = 10 ** rng.uniform(2.7, 5.3, nstars)
    gx = rng.uniform(40, W - 40, ngal)
    gy = rng.uniform(40, H - 40, ngal)
    gflux = 10 ** rng.uniform(3.2, 4.8, ngal)
    gre = rng.uniform(2.0, 10.0, ngal)
    gn = rng.uniform(1.0, 4.0, ngal)
    gq = rng.uniform(0.3, 1.0, ngal)
    gpa = rng.uniform(0, np.pi, ngal)

    # background: gradient + vignetting bowl (reference frames carry
    # BKG_VAL~150 offsets with structure on >> BKG_BOX_SIZE scales)
    yg, xg = np.mgrid[0:H, 0:W].astype('f4')
    bkg = (150.0 + 25.0 * (xg / W) + 18.0 * (yg / H) ** 1.5
           + 12.0 * ((xg / W - 0.5) ** 2 + (yg / H - 0.5) ** 2))

    # mask plane: dead columns, hot pixel clusters (science & ref share
    # the detector defects; bits from zuds MASK_BITS semantics)
    mask_det = np.zeros((H, W), np.uint16)
    dead_cols = rng.integers(50, W - 50, 4)
    for c in dead_cols:
        mask_det[:, c] |= 1 << 0          # BIT00: dead
    hot = rng.integers(0, H * W, 200)
    mask_det.ravel()[hot] |= 1 << 3       # BIT03: hot pixels

    def render(seeing, with_cr, extra, rng_noise):
        img = bkg.copy()
        sig = seeing / 2.355
        _gaussian_stars(img, sx, sy, sflux, sig)
        _sersic_galaxies(img, gx, gy, gflux, gre, gn, gq, gpa, sig)
        if extra is not None:
            _gaussian_stars(img, [extra[0]], [extra[1]], [extra[2]], sig)
        crs = _cosmic_rays(img, rng_noise, n=ncr) if with_cr else None
        img += rng_noise.normal(0, 5.0, (H, W)).astype('f4')
        # saturation bleeds: mark saturated pixels + a bleed column stub
        m = mask_det.copy()
        satpix = img > sat_level
        m[satpix] |= 1 << 9               # BIT09: saturated
        ys_, xs_ = np.nonzero(satpix)
        for x, y in zip(xs_, ys_):
            m[max(0, y - 6):min(H, y + 7), x] |= 1 << 9
        img = np.minimum(img, sat_level).astype('f4')
        # dead columns read as sky (no signal)
        img[:, dead_cols] = bkg[:, dead_cols] + rng_noise.normal(
            0, 5.0, (H, len(dead_cols))).astype('f4')
        return img.astype('f4'), m, crs

    # reference: deep coadd — lower noise, better seeing, no CRs. Render
    # in the ref pixel grid by shifting the shared content by the dither.
    rx, ry = wcs_ref.sky2pix_0(*wcs_sci.pix2sky_0(sx, sy))
    gxr, gyr = wcs_ref.sky2pix_0(*wcs_sci.pix2sky_0(gx, gy))
    rng_ref = np.random.default_rng(seed + 1)
    ref = bkg.copy()
    _gaussian_stars(ref, rx, ry, sflux, seeing_ref / 2.355)
    _sersic_galaxies(ref, gxr, gyr, gflux, gre, gn, gq, gpa,
                     seeing_ref / 2.355)
    ref += rng_ref.normal(0, 2.0, (H, W)).astype('f4')
    refm = mask_det.copy()
    refsat = ref > sat_level
    refm[refsat] |= 1 << 9
    ref = np.minimum(ref, sat_level).astype('f4')
    # the reference product is background-subtracted + BKG_VAL offset
    # (zuds/coadd.py:205-228 semantics): flatten its sky
    ref = ref - bkg + 150.0

    rng_sci = np.random.default_rng(seed + 2)
    sci, scim, crs = render(seeing_sci, True, transient, rng_sci)

    truth = {'stars': np.stack([sx, sy], 1), 'gals': np.stack([gx, gy], 1),
             'crs': crs, 'transient': transient, 'dead_cols': dead_cols}
    return sci, scim, ref.astype('f4'), refm, wcs_sci, wcs_ref, truth


def write_scene_pair(d, H, W, **kwargs):
    """Write the scene pair as sci/ref FITS + sibling masks; returns
    (sci_path, ref_path, truth)."""
    import os
    os.makedirs(d, exist_ok=True)
    sci, scim, ref, refm, wcs_sci, wcs_ref, truth = render_scene_pair(
        H, W, **kwargs)

    def write(path, data, mdata, wcs, mjd, seeing):
        h = Header()
        wcs.to_header(h)
        h.set('MAGZP', 26.3)
        h.set('OBSMJD', mjd)
        h.set('FIELDID', 679)
        h.set('CCDID', 1)
        h.set('QID', 2)
        h.set('FILTERID', 2)
        h.set('SATURATE', 60000.0)
        h.set('SEEING', seeing)
        h.set('FILENAME', os.path.basename(path))
        write_fits(path, [HDU(h, data)])
        write_fits(path.replace('sciimg', 'mskimg'),
                   [HDU(h.copy(), mdata.astype(np.uint16))])

    sci_path = os.path.join(d, 'scene_sci_sciimg.fits')
    ref_path = os.path.join(d, 'scene_ref_sciimg.fits')
    write(sci_path, sci, scim, wcs_sci, 58345.0,
          kwargs.get('seeing_sci', 2.8))
    write(ref_path, ref, refm, wcs_ref, 58300.0,
          kwargs.get('seeing_ref', 2.0))
    return sci_path, ref_path, truth


def write_scene_night(d, H, W, epochs, seed=11, nstars=800, ngal=120,
                      ncr=25, seeing_ref=2.0, sat_level=60000.0):
    """One reference + N dithered science epochs over a shared sky.

    ``epochs``: list of dicts with keys ``dither`` (sci CRPIX offset from
    the ref grid), ``seeing`` (px FWHM), ``transient`` ((x, y, flux) in
    that epoch's pixel coords). Content (stars, galaxies, background,
    detector defects) is defined once in the REFERENCE pixel grid and
    re-rendered into each epoch's grid through the WCS pair — the
    structure of a real observing night against one field reference
    (reference rank loop: zuds scripts/dosub.py:202-211).

    Returns (ref_path, [sci_paths], [truths]).
    """
    import os
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    scale = 1.01 / 3600.0
    wcs_ref = TPVWCS.simple(crval=(150.1, 35.2),
                            crpix=(W / 2 + 0.5, H / 2 + 0.5),
                            scale_deg=scale)

    sx = rng.uniform(25, W - 25, nstars)
    sy = rng.uniform(25, H - 25, nstars)
    sflux = 10 ** rng.uniform(2.7, 5.3, nstars)
    gx = rng.uniform(40, W - 40, ngal)
    gy = rng.uniform(40, H - 40, ngal)
    gflux = 10 ** rng.uniform(3.2, 4.8, ngal)
    gre = rng.uniform(2.0, 10.0, ngal)
    gn = rng.uniform(1.0, 4.0, ngal)
    gq = rng.uniform(0.3, 1.0, ngal)
    gpa = rng.uniform(0, np.pi, ngal)

    yg, xg = np.mgrid[0:H, 0:W].astype('f4')
    bkg = (150.0 + 25.0 * (xg / W) + 18.0 * (yg / H) ** 1.5
           + 12.0 * ((xg / W - 0.5) ** 2 + (yg / H - 0.5) ** 2))
    mask_det = np.zeros((H, W), np.uint16)
    dead_cols = rng.integers(50, W - 50, 4)
    for c in dead_cols:
        mask_det[:, c] |= 1 << 0
    hot = rng.integers(0, H * W, 200)
    mask_det.ravel()[hot] |= 1 << 3

    def write(path, data, mdata, wcs, mjd, seeing):
        h = Header()
        wcs.to_header(h)
        for k, v in [('MAGZP', 26.3), ('OBSMJD', mjd), ('FIELDID', 679),
                     ('CCDID', 1), ('QID', 2), ('FILTERID', 2),
                     ('SATURATE', sat_level), ('SEEING', seeing)]:
            h.set(k, v)
        h.set('FILENAME', os.path.basename(path))
        write_fits(path, [HDU(h, data)])
        write_fits(path.replace('sciimg', 'mskimg'),
                   [HDU(h.copy(), mdata.astype(np.uint16))])

    rng_ref = np.random.default_rng(seed + 1)
    ref = bkg.copy()
    _gaussian_stars(ref, sx, sy, sflux, seeing_ref / 2.355)
    _sersic_galaxies(ref, gx, gy, gflux, gre, gn, gq, gpa,
                     seeing_ref / 2.355)
    ref += rng_ref.normal(0, 2.0, (H, W)).astype('f4')
    refm = mask_det.copy()
    refm[ref > sat_level] |= 1 << 9
    ref = np.minimum(ref, sat_level).astype('f4')
    ref = (ref - bkg + 150.0).astype('f4')
    ref_path = os.path.join(d, 'night_ref_sciimg.fits')
    write(ref_path, ref, refm, wcs_ref, 58300.0, seeing_ref)

    sci_paths, truths = [], []
    for k, ep in enumerate(epochs):
        dx, dy = ep['dither']
        wcs_k = TPVWCS.simple(crval=(150.1, 35.2),
                              crpix=(W / 2 + 0.5 + dx, H / 2 + 0.5 + dy),
                              scale_deg=scale)
        kx, ky = wcs_k.sky2pix_0(*wcs_ref.pix2sky_0(sx, sy))
        gxk, gyk = wcs_k.sky2pix_0(*wcs_ref.pix2sky_0(gx, gy))
        sig = ep['seeing'] / 2.355
        img = bkg.copy()
        _gaussian_stars(img, kx, ky, sflux, sig)
        _sersic_galaxies(img, gxk, gyk, gflux, gre, gn, gq, gpa, sig)
        tx, ty, tf = ep['transient']
        _gaussian_stars(img, [tx], [ty], [tf], sig)
        rng_k = np.random.default_rng(seed + 100 + k)
        crs = _cosmic_rays(img, rng_k, n=ncr)
        img += rng_k.normal(0, 5.0, (H, W)).astype('f4')
        m = mask_det.copy()
        satpix = img > sat_level
        m[satpix] |= 1 << 9
        ys_, xs_ = np.nonzero(satpix)
        for x, y in zip(xs_, ys_):
            m[max(0, y - 6):min(H, y + 7), x] |= 1 << 9
        img = np.minimum(img, sat_level).astype('f4')
        img[:, dead_cols] = bkg[:, dead_cols] + rng_k.normal(
            0, 5.0, (H, len(dead_cols))).astype('f4')
        p = os.path.join(d, f'night_ep{k}_sciimg.fits')
        write(p, img.astype('f4'), m, wcs_k, 58345.0 + 0.01 * k,
              ep['seeing'])
        sci_paths.append(p)
        truths.append({'transient': ep['transient'], 'crs': crs,
                       'dither': ep['dither'], 'seeing': ep['seeing']})
    return ref_path, sci_paths, truths
