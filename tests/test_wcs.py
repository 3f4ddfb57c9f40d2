"""TPV WCS tests: analytic gnomonic checks, distortion round trips, mapping."""
import numpy as np
import pytest

from zuds_tpu.wcs import TPVWCS, pixel_mapping
from zuds_tpu.wcs.tpv import NUM_PV, _tan_project, _tan_deproject


SCALE = 1.01 / 3600.0  # ZTF-like pixel scale, deg/px


def ztf_like_wcs(rot=0.0, crval=(150.1, 35.2), crpix=(1536.5, 1540.5),
                 distort=False):
    wcs = TPVWCS.simple(crval=np.array(crval), crpix=np.array(crpix),
                        scale_deg=SCALE, rot_deg=rot)
    if distort:
        # ZTF-magnitude TPV terms (quadratic + cubic, ~1px at field corner)
        wcs.pv1 = wcs.pv1.copy()
        wcs.pv2 = wcs.pv2.copy()
        wcs.pv1[[0, 4, 5, 6, 7]] = [1e-5, 2.3e-4, -1.1e-4, 8e-5, 4e-5]
        wcs.pv2[[0, 4, 5, 6, 8]] = [-2e-5, 1.7e-4, 9e-5, -6e-5, -3e-5]
    return wcs


def test_gnomonic_roundtrip():
    rng = np.random.default_rng(0)
    ra0, dec0 = 210.5, -12.25
    xi = rng.uniform(-1, 1, 100)
    eta = rng.uniform(-1, 1, 100)
    ra, dec = _tan_deproject(xi, eta, ra0, dec0)
    xi2, eta2 = _tan_project(ra, dec, ra0, dec0)
    np.testing.assert_allclose(xi2, xi, atol=1e-12)
    np.testing.assert_allclose(eta2, eta, atol=1e-12)


def test_gnomonic_small_angle():
    # near the tangent point, xi/eta reduce to local offsets
    ra0, dec0 = 150.0, 0.0
    ra, dec = _tan_deproject(1e-4, 2e-4, ra0, dec0)
    assert ra == pytest.approx(150.0 + 1e-4, abs=1e-10)
    assert dec == pytest.approx(2e-4, abs=1e-10)


def test_crpix_maps_to_crval():
    wcs = ztf_like_wcs()
    ra, dec = wcs.pix2sky(1536.5, 1540.5)
    assert ra == pytest.approx(150.1, abs=1e-12)
    assert dec == pytest.approx(35.2, abs=1e-12)


def test_pixel_scale():
    wcs = ztf_like_wcs(rot=17.0)
    assert wcs.pixel_scale_arcsec() == pytest.approx(1.01, rel=1e-9)


@pytest.mark.parametrize('distort', [False, True])
@pytest.mark.parametrize('rot', [0.0, 0.3])
def test_pix_sky_roundtrip(rot, distort):
    wcs = ztf_like_wcs(rot=rot, distort=distort)
    rng = np.random.default_rng(1)
    x = rng.uniform(1, 3072, 500)
    y = rng.uniform(1, 3080, 500)
    ra, dec = wcs.pix2sky(x, y)
    x2, y2 = wcs.sky2pix(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-8)
    np.testing.assert_allclose(y2, y, atol=1e-8)


def test_header_roundtrip():
    wcs = ztf_like_wcs(rot=1.2, distort=True)
    h = wcs.to_header()
    wcs2 = TPVWCS.from_header(h)
    rng = np.random.default_rng(2)
    x = rng.uniform(1, 3072, 50)
    y = rng.uniform(1, 3080, 50)
    ra1, dec1 = wcs.pix2sky(x, y)
    ra2, dec2 = wcs2.pix2sky(x, y)
    np.testing.assert_allclose(ra1, ra2, atol=1e-12)
    np.testing.assert_allclose(dec1, dec2, atol=1e-12)


def test_footprint_orientation():
    wcs = ztf_like_wcs()
    fp = wcs.footprint(3072, 3080)
    assert fp.shape == (4, 2)
    # field spans ~0.86 deg
    dra = (fp[:, 0].max() - fp[:, 0].min()) * np.cos(np.deg2rad(35.2))
    assert dra == pytest.approx(3072 * SCALE, rel=0.01)


def test_identity_mapping():
    wcs = ztf_like_wcs(distort=True)
    grid = pixel_mapping(wcs, wcs, (3080, 3072), step=32)
    # mapping an image onto its own WCS is the identity
    gy = np.arange(grid.u.shape[0]) * 32.0
    gx = np.arange(grid.u.shape[1]) * 32.0
    np.testing.assert_allclose(
        grid.u, np.broadcast_to(gx[None, :], grid.u.shape), atol=1e-3)
    np.testing.assert_allclose(
        grid.v, np.broadcast_to(gy[:, None], grid.v.shape), atol=1e-3)
    assert grid.max_offset < 1e-3


def test_shift_mapping():
    # dst WCS shifted by 10.25 px in x: src coords = dst + 10.25
    src = ztf_like_wcs()
    dst = ztf_like_wcs(crpix=(1536.5 - 10.25, 1540.5))
    grid = pixel_mapping(src, dst, (512, 512), step=32)
    gx = np.arange(grid.u.shape[1]) * 32.0
    np.testing.assert_allclose(grid.u - gx[None, :], 10.25, atol=1e-3)
    assert grid.max_offset == pytest.approx(10.25, abs=0.01)


def test_mapping_interp_error_small():
    """Coarse-grid bilinear mapping is accurate to <1e-3 px mid-cell."""
    src = ztf_like_wcs(distort=True)
    dst = ztf_like_wcs(rot=0.05, crpix=(1530.0, 1545.0))
    grid = pixel_mapping(src, dst, (3080, 3072), step=32)
    # evaluate exactly at an off-grid point and compare with bilinear interp
    yy, xx = 1013.0, 2041.0
    ra, dec = dst.pix2sky_0(xx, yy)
    su, sv = src.sky2pix_0(ra, dec)
    i, j = int(yy // 32), int(xx // 32)
    fy, fx = yy / 32 - i, xx / 32 - j
    for g, exact in [(grid.u, su), (grid.v, sv)]:
        interp = (g[i, j] * (1 - fy) * (1 - fx) + g[i, j + 1] * (1 - fy) * fx
                  + g[i + 1, j] * fy * (1 - fx) + g[i + 1, j + 1] * fy * fx)
        assert interp == pytest.approx(exact, abs=1e-3)


def test_ztf_real_header_values():
    """Distortion magnitudes from a real ZTF header parse & invert cleanly."""
    from zuds_tpu.fits import Header
    h = Header()
    h.set('CTYPE1', 'RA---TPV')
    h.set('CTYPE2', 'DEC--TPV')
    h.set('CRPIX1', 1536.5)
    h.set('CRPIX2', 1540.5)
    h.set('CRVAL1', 149.871546)
    h.set('CRVAL2', 33.546917)
    h.set('CD1_1', -2.8063e-4)
    h.set('CD1_2', 2.31e-7)
    h.set('CD2_1', 2.49e-7)
    h.set('CD2_2', 2.8060e-4)
    for k, v in [('PV1_0', 9.5e-5), ('PV1_1', 1.0007), ('PV1_2', -3.2e-4),
                 ('PV1_4', 1.2e-3), ('PV1_5', -9.1e-4), ('PV1_6', 7.7e-4),
                 ('PV2_0', -1.1e-4), ('PV2_1', 1.0006), ('PV2_2', 4.1e-4),
                 ('PV2_4', -1.0e-3), ('PV2_5', 8.8e-4), ('PV2_6', -6.2e-4)]:
        h.set(k, v)
    wcs = TPVWCS.from_header(h)
    x = np.array([1.0, 3072.0, 1536.0])
    y = np.array([1.0, 3080.0, 1540.0])
    ra, dec = wcs.pix2sky(x, y)
    x2, y2 = wcs.sky2pix(ra, dec)
    np.testing.assert_allclose(x2, x, atol=1e-7)
    np.testing.assert_allclose(y2, y, atol=1e-7)


def test_pv_default_is_per_axis():
    # PV terms on only one axis must not zero the other polynomial: the
    # TPV convention defaults PVi_1=1 independently per axis
    from zuds_tpu.fits import Header
    h = Header()
    for k, v in [('CRPIX1', 1536.0), ('CRPIX2', 1540.0),
                 ('CRVAL1', 150.0), ('CRVAL2', 35.0),
                 ('CD1_1', -2.8e-4), ('CD2_2', 2.8e-4),
                 ('PV2_1', 1.0), ('PV2_5', 0.01)]:
        h.set(k, v)
    wcs = TPVWCS.from_header(h)
    assert wcs.pv1[1] == 1.0
    ra, dec = wcs.pix2sky(np.array([100.0]), np.array([200.0]))
    assert np.isfinite(ra).all() and abs(ra[0] - 150.0) > 1e-3


def test_tpv_degree3_refit_recovers_distortion():
    """SCAMP-equivalent degree-3 PV refit: a frame distorted with known
    cubic PV terms is recovered to <0.05 px (VERDICT r1 item 6;
    reference zuds/astromatic/default.scamp DISTORT_DEGREES 3)."""
    from zuds_tpu.scamp import fit_tpv_correction

    rng = np.random.default_rng(11)
    scale = 1.01 / 3600.0
    true = TPVWCS.simple(crval=(150.0, 35.0), crpix=(1536.5, 1540.5),
                         scale_deg=scale)
    # inject ZTF-scale cubic distortion (~1e-3 relative at field edge)
    true.pv1 = true.pv1.copy()
    true.pv2 = true.pv2.copy()
    true.pv1[[0, 2, 4, 5, 7, 9]] = [2e-5, 1.5e-3, 8e-3, -5e-3, 1.2e-2, 6e-3]
    true.pv2[[0, 6, 8, 10]] = [-1e-5, 7e-3, -9e-3, 1.1e-2]
    true.pv2[1] += 2e-3   # perturb the identity linear term, don't replace

    # star pixel positions + their TRUE sky positions under the distortion
    xs = rng.uniform(10, 3062, 400)
    ys = rng.uniform(10, 3070, 400)
    ra, dec = true.pix2sky(xs, ys)

    # start from the undistorted guess (what a raw header would carry)
    guess = TPVWCS.simple(crval=(150.0, 35.0), crpix=(1536.5, 1540.5),
                          scale_deg=scale)
    gx, gy = guess.sky2pix(ra, dec)
    assert np.hypot(gx - xs, gy - ys).max() > 0.5  # distortion is real

    fitted = fit_tpv_correction(guess, xs, ys, ra, dec, degree=3)
    fx, fy = fitted.sky2pix(ra, dec)
    resid = np.hypot(fx - xs, fy - ys)
    assert resid.max() < 0.05

    # holdout points (not used in the fit) also land sub-0.05 px
    hx = rng.uniform(10, 3062, 100)
    hy = rng.uniform(10, 3070, 100)
    hra, hdec = true.pix2sky(hx, hy)
    px, py = fitted.sky2pix(hra, hdec)
    assert np.hypot(px - hx, py - hy).max() < 0.05


def test_match_catalogs_grid_hash():
    """O(N) matcher: same pairs as brute force, radius respected."""
    from zuds_tpu.scamp import match_catalogs
    from zuds_tpu.spatial import angular_distance

    rng = np.random.default_rng(3)
    n = 300
    ra2 = rng.uniform(149.5, 150.5, n)
    dec2 = rng.uniform(34.5, 35.5, n)
    # catalog 1: jittered subset + some orphans far away
    sel = rng.choice(n, 120, replace=False)
    ra1 = ra2[sel] + rng.normal(0, 0.3 / 3600, 120) / np.cos(np.radians(35))
    dec1 = dec2[sel] + rng.normal(0, 0.3 / 3600, 120)
    ra1 = np.concatenate([ra1, rng.uniform(120, 121, 20)])
    dec1 = np.concatenate([dec1, rng.uniform(10, 11, 20)])

    i1, i2 = match_catalogs(ra1, dec1, ra2, dec2, radius_arcsec=2.0)
    # brute-force truth
    bi1, bi2 = [], []
    for i in range(len(ra1)):
        d = angular_distance(ra1[i], dec1[i], ra2, dec2) * 3600.0
        j = int(np.argmin(d))
        if d[j] <= 2.0:
            bi1.append(i)
            bi2.append(j)
    assert list(i1) == bi1
    assert list(i2) == bi2
