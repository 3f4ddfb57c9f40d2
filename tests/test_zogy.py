"""ZOGY proper subtraction tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from zuds_tpu.ops.zogy import zogy_subtract, estimate_psf_from_stars


def gauss_psf(size, sigma):
    r = size // 2
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    p = np.exp(-(x * x + y * y) / (2 * sigma ** 2))
    return (p / p.sum()).astype('f4')


def render(H, W, xs, ys, fluxes, sigma, rng, noise):
    yy, xx = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W))
    for x, y, f in zip(xs, ys, fluxes):
        img += f * np.exp(-((xx - x) ** 2 + (yy - y) ** 2)
                          / (2 * sigma ** 2)) / (2 * np.pi * sigma ** 2)
    return (img + rng.normal(0, noise, (H, W))).astype('f4')


def test_zogy_stars_cancel_transient_survives(rng):
    H = W = 256
    xs = rng.uniform(20, W - 20, 30)
    ys = rng.uniform(20, H - 20, 30)
    fluxes = rng.uniform(5000, 30000, 30)
    sig_r, sig_n, noise = 1.5, 2.2, 1.0
    ref = render(H, W, xs, ys, fluxes, sig_r, rng, noise)
    new = render(H, W, xs, ys, fluxes, sig_n, rng, noise)
    # transient only in new
    tx, ty, tf = 130, 140, 15000.0
    yy, xx = np.mgrid[0:H, 0:W]
    new += (tf * np.exp(-((xx - tx) ** 2 + (yy - ty) ** 2) / (2 * sig_n ** 2))
            / (2 * np.pi * sig_n ** 2)).astype('f4')

    out = zogy_subtract(jnp.array(new), jnp.array(ref),
                        jnp.array(gauss_psf(25, sig_n)),
                        jnp.array(gauss_psf(25, sig_r)),
                        noise, noise)
    s = np.array(out['s_corr'])
    # transient is the highest-significance peak
    assert s[ty, tx] > 20.0
    peak = np.unravel_index(np.argmax(s), s.shape)
    assert abs(peak[0] - ty) <= 1 and abs(peak[1] - tx) <= 1
    # star positions are clean in the score image
    for x, y in zip(xs[:10], ys[:10]):
        assert abs(s[int(y), int(x)]) < 6.0


def test_zogy_noise_normalization(rng):
    """On pure noise, s_corr is unit-variance."""
    H = W = 256
    ref = rng.normal(0, 3.0, (H, W)).astype('f4')
    new = rng.normal(0, 3.0, (H, W)).astype('f4')
    out = zogy_subtract(jnp.array(new), jnp.array(ref),
                        jnp.array(gauss_psf(25, 2.0)),
                        jnp.array(gauss_psf(25, 1.6)),
                        3.0, 3.0)
    s = np.array(out['s_corr'])
    assert s.std() == pytest.approx(1.0, rel=0.1)
    d = np.array(out['d'])
    assert np.isfinite(d).all()


def test_psf_estimation(rng):
    H = W = 256
    sigma = 1.8
    xs = rng.uniform(30, W - 30, 20)
    ys = rng.uniform(30, H - 30, 20)
    fluxes = np.full(20, 50000.0)
    img = render(H, W, xs, ys, fluxes, sigma, rng, noise=1.0)
    psf = np.array(estimate_psf_from_stars(
        jnp.array(img), jnp.array(xs.astype('f4')),
        jnp.array(ys.astype('f4')), jnp.ones(20, dtype=bool), size=25))
    assert psf.sum() == pytest.approx(1.0, abs=1e-5)
    truth = gauss_psf(25, sigma)
    assert np.abs(psf - truth).max() < 0.01
    # centroid centered
    r = 12
    y, x = np.mgrid[-r:r + 1, -r:r + 1]
    assert abs((psf * x).sum()) < 0.05
    assert abs((psf * y).sum()) < 0.05
