"""Aperture photometry op tests: exact overlap geometry + batched sums."""
import numpy as np
import jax.numpy as jnp
import pytest

from zuds_tpu.ops.photometry import (circle_pixel_overlap,
                                     aperture_photometry_batched)


def test_overlap_full_and_empty():
    # pixel fully inside r=3 circle
    assert float(circle_pixel_overlap(jnp.array(0.0), jnp.array(0.0), 3.0)) \
        == pytest.approx(1.0, abs=1e-6)
    assert float(circle_pixel_overlap(jnp.array(1.0), jnp.array(1.0), 3.0)) \
        == pytest.approx(1.0, abs=1e-6)
    # pixel fully outside
    assert float(circle_pixel_overlap(jnp.array(5.0), jnp.array(0.0), 3.0)) \
        == pytest.approx(0.0, abs=1e-6)


def test_overlap_total_area():
    """Sum of overlaps over a pixel grid equals the circle area."""
    for r in [1.0, 2.5, 3.0, 4.7]:
        n = 15
        c = n // 2
        yy, xx = np.mgrid[0:n, 0:n]
        w = np.array(circle_pixel_overlap(
            jnp.array((xx - c).astype('f4')), jnp.array((yy - c).astype('f4')),
            r))
        assert w.sum() == pytest.approx(np.pi * r * r, rel=3e-4), r  # f32 arcsin conditioning


def test_overlap_half_pixel():
    # circle edge bisecting a pixel at the 3 o'clock point: near-half
    # coverage (slight deficit from edge curvature at production radii)
    r = 3.0
    w = float(circle_pixel_overlap(jnp.array(r), jnp.array(0.0), r))
    # fine-subsampling reference: ~0.5 minus the edge-curvature deficit
    s = (np.arange(512) + 0.5) / 512 - 0.5
    sy, sx = np.meshgrid(s, s, indexing='ij')
    mc = (((r + sx) ** 2 + sy ** 2) <= r * r).mean()
    assert w == pytest.approx(mc, abs=1e-3)


def test_overlap_matches_oversampling(rng):
    """Exact overlap agrees with fine subpixel sampling."""
    r = 3.0
    for _ in range(20):
        dx = rng.uniform(-4, 4)
        dy = rng.uniform(-4, 4)
        exact = float(circle_pixel_overlap(jnp.array(dx), jnp.array(dy), r))
        # 64x64 subsampling
        s = (np.arange(64) + 0.5) / 64 - 0.5
        sy, sx = np.meshgrid(s, s, indexing='ij')
        mc = ((dx + sx) ** 2 + (dy + sy) ** 2 <= r * r).mean()
        assert exact == pytest.approx(mc, abs=2e-3)


def test_flat_field_flux():
    img = np.full((64, 64), 7.0, dtype='f4')
    rms = np.ones((64, 64), dtype='f4')
    out = aperture_photometry_batched(jnp.array(img), jnp.array(rms), None,
                                      jnp.array([32.3]), jnp.array([31.7]),
                                      r=3.0)
    area = np.pi * 9.0
    assert float(out['flux'][0]) == pytest.approx(7.0 * area, rel=1e-5)
    assert float(out['fluxerr'][0]) == pytest.approx(np.sqrt(area), rel=1e-5)
    assert float(out['area'][0]) == pytest.approx(area, rel=1e-5)


def test_gaussian_aperture_flux(rng):
    """r=3 aperture on a sigma=1.2 Gaussian captures the analytic fraction."""
    H = W = 64
    yy, xx = np.mgrid[0:H, 0:W]
    sigma = 1.2
    total = 10000.0
    x0, y0 = 30.37, 33.61
    img = (total / (2 * np.pi * sigma ** 2)
           * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sigma ** 2))
           ).astype('f4')
    out = aperture_photometry_batched(jnp.array(img), None, None,
                                      jnp.array([x0]), jnp.array([y0]), r=3.0)
    # continuous-aperture analytic fraction: agrees to the level of the
    # pixel-sampling approximation (value-at-center x overlap-area)
    frac = 1 - np.exp(-9.0 / (2 * sigma ** 2))
    assert float(out['flux'][0]) == pytest.approx(total * frac, rel=2e-2)
    # geometry-only reference: same pixel values, 64x64-subsampled weights
    s = (np.arange(64) + 0.5) / 64 - 0.5
    sy, sx = np.meshgrid(s, s, indexing='ij')
    w = np.zeros_like(img, dtype='f8')
    for py in range(int(y0) - 5, int(y0) + 6):
        for px in range(int(x0) - 5, int(x0) + 6):
            w[py, px] = (((px + sx - x0) ** 2 + (py + sy - y0) ** 2)
                         <= 9.0).mean()
    expected = (img.astype('f8') * w).sum()
    assert float(out['flux'][0]) == pytest.approx(expected, rel=2e-4)


def test_mask_flags_and_oob():
    img = np.zeros((32, 32), dtype='f4')
    mask = np.zeros((32, 32), dtype=np.uint32)
    mask[16, 18] = 1 << 2
    out = aperture_photometry_batched(
        jnp.array(img), None, jnp.array(mask),
        jnp.array([16.0, 2.0, 16.0]), jnp.array([16.0, 16.0, 2.0]), r=3.0)
    flags = np.array(out['flags'])
    assert flags[0] & (1 << 2)          # masked pixel inside aperture
    oob = np.array(out['oob'])
    assert not oob[0] and oob[1] and oob[2]


def test_many_sources_batched(rng):
    H = W = 256
    img = rng.normal(100.0, 1.0, (H, W)).astype('f4')
    n = 500
    xs = rng.uniform(10, W - 10, n).astype('f4')
    ys = rng.uniform(10, H - 10, n).astype('f4')
    out = aperture_photometry_batched(jnp.array(img), None, None,
                                      jnp.array(xs), jnp.array(ys), r=3.0)
    flux = np.array(out['flux'])
    assert flux.shape == (n,)
    np.testing.assert_allclose(flux, 100.0 * np.pi * 9, rtol=0.05)
