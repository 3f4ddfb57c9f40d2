"""Clipped-coadd combine tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from zuds_tpu.ops.coadd import (clipped_coadd, combine_masks, fluxscale,
                                clipped_coadd_scan)


def test_fluxscale():
    assert float(fluxscale(25.0)) == pytest.approx(1.0)
    assert float(fluxscale(27.5)) == pytest.approx(10 ** (-0.4 * 2.5))


def make_stack(rng, n=8, H=64, W=64, sigma=5.0, mean=100.0):
    imgs = rng.normal(mean, sigma, (n, H, W)).astype('f4')
    weights = np.full((n, H, W), 1.0 / sigma ** 2, dtype='f4')
    return imgs, weights


def test_mean_combine(rng):
    imgs, weights = make_stack(rng)
    out = clipped_coadd(jnp.array(imgs), jnp.array(weights))
    coadd = np.array(out['coadd'])
    assert coadd.mean() == pytest.approx(100.0, abs=0.5)
    # noise reduced ~ sqrt(8)
    assert coadd.std() == pytest.approx(5.0 / np.sqrt(8), rel=0.15)
    w = np.array(out['weight'])
    # a handful of pixels legitimately lose one epoch to the 4-sigma clip
    assert np.median(w) == pytest.approx(8 / 25.0, rel=1e-5)
    assert (w >= 7 / 25.0 - 1e-6).all()


def test_outlier_rejected(rng):
    imgs, weights = make_stack(rng)
    # cosmic ray in epoch 3
    imgs[3, 20, 20] += 500.0
    out = clipped_coadd(jnp.array(imgs), jnp.array(weights))
    coadd = np.array(out['coadd'])
    nclip = np.array(out['nclip'])
    assert abs(coadd[20, 20] - 100.0) < 10.0
    assert nclip[20, 20] == 1
    assert nclip.sum() < 50  # few false rejections


def test_transient_survives_median_but_counts(rng):
    """A source present in ALL epochs must never be clipped."""
    imgs, weights = make_stack(rng)
    imgs[:, 30, 30] += 300.0
    out = clipped_coadd(jnp.array(imgs), jnp.array(weights))
    assert np.array(out['coadd'])[30, 30] == pytest.approx(400.0, abs=8.0)
    assert np.array(out['nclip'])[30, 30] == 0


def test_zero_weight_epochs(rng):
    imgs, weights = make_stack(rng, n=4)
    weights[1, :32] = 0.0       # top half of epoch 1 has no coverage
    imgs[1, :32] = 1e9          # garbage pixels must be ignored
    out = clipped_coadd(jnp.array(imgs), jnp.array(weights))
    coadd = np.array(out['coadd'])
    assert abs(coadd[:32].mean() - 100.0) < 1.0
    assert np.array(out['nexp'])[:32].max() == 3
    assert np.array(out['nexp'])[40:].min() == 4


def test_scales_normalize_zeropoints(rng):
    n, H, W = 4, 32, 32
    base = rng.normal(100.0, 1.0, (H, W)).astype('f4')
    zps = np.array([25.0, 26.0, 24.5, 25.5])
    scales = np.array([float(fluxscale(z)) for z in zps], dtype='f4')
    # each epoch is the same sky but at its own zeropoint
    imgs = np.stack([base / s for s in scales]).astype('f4')
    weights = np.stack([np.full((H, W), s ** 2) for s in scales]).astype('f4')
    out = clipped_coadd(jnp.array(imgs), jnp.array(weights),
                        jnp.array(scales))
    np.testing.assert_allclose(np.array(out['coadd']), base, rtol=1e-5)


def test_combine_masks_and_or():
    masks = np.zeros((3, 8, 8), dtype=np.uint16)
    masks[:, 2, 2] = 4          # bit set in all epochs
    masks[0, 3, 3] = 8          # bit set in one epoch
    cov = np.ones((3, 8, 8), dtype=bool)
    m_and = np.array(combine_masks(jnp.array(masks), jnp.array(cov), 'and'))
    m_or = np.array(combine_masks(jnp.array(masks), jnp.array(cov), 'or'))
    assert m_and[2, 2] == 4
    assert m_and[3, 3] == 0
    assert m_or[3, 3] == 8
    # epoch without coverage doesn't veto the AND
    cov[1] = False
    masks[1] = 0
    m_and2 = np.array(combine_masks(jnp.array(masks), jnp.array(cov), 'and'))
    assert m_and2[2, 2] == 4


def test_scan_variant_matches(rng):
    imgs, weights = make_stack(rng, n=6)
    imgs[2, 10, 10] += 1000.0
    full = clipped_coadd(jnp.array(imgs), jnp.array(weights))
    med = jnp.asarray(np.median(imgs, axis=0))
    scan = clipped_coadd_scan(jnp.array(imgs), jnp.array(weights), med=med)
    np.testing.assert_allclose(np.array(scan['coadd']),
                               np.array(full['coadd']), atol=0.2)
