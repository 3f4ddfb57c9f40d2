"""Background mesh tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from zuds_tpu.ops.background import (background_mesh, masked_median,
                                     median_filter_mesh)


def test_masked_median():
    x = jnp.array([[1.0, 2.0, 3.0, 100.0]])
    valid = jnp.array([[True, True, True, False]])
    assert float(masked_median(x, valid)[0]) == 2.0
    valid2 = jnp.array([[True, True, True, True]])
    assert float(masked_median(x, valid2)[0]) == 2.5


def test_median_filter_mesh():
    mesh = jnp.array([[1.0, 1.0, 1.0],
                      [1.0, 100.0, 1.0],
                      [1.0, 1.0, 1.0]])
    out = np.array(median_filter_mesh(mesh, 3))
    assert out[1, 1] == 1.0


def test_flat_background_recovered(rng):
    img = rng.normal(150.0, 12.0, size=(512, 384)).astype('f4')
    res = background_mesh(jnp.array(img), box=128)
    back = np.array(res['back'])
    rms = np.array(res['rms'])
    assert back.shape == img.shape
    np.testing.assert_allclose(back, 150.0, atol=1.5)
    np.testing.assert_allclose(rms, 12.0, rtol=0.1)


def test_gradient_background(rng):
    H, W = 1024, 1024
    y, x = np.mgrid[0:H, 0:W]
    truth = 100.0 + 0.05 * x + 0.02 * y
    img = (truth + rng.normal(0, 5.0, (H, W))).astype('f4')
    res = background_mesh(jnp.array(img), box=128)
    back = np.array(res['back'])
    # edge mesh cells are biased by the replicated 3x3 median filter (same
    # artifact as SExtractor's BACK_FILTERSIZE at frame borders); check pixels
    # that only interpolate from interior cells
    inner = np.s_[192:-192, 192:-192]
    np.testing.assert_allclose(back[inner], truth[inner], atol=1.0)


def test_sources_rejected(rng):
    """Bright sources shouldn't drag the background up."""
    H, W = 512, 512
    img = rng.normal(150.0, 10.0, (H, W)).astype('f4')
    # plant 200 bright point sources
    ys = rng.integers(10, H - 10, 200)
    xs = rng.integers(10, W - 10, 200)
    for yy, xx in zip(ys, xs):
        img[yy - 2:yy + 3, xx - 2:xx + 3] += 5000.0
    res = background_mesh(jnp.array(img), box=128)
    back = np.array(res['back'])
    np.testing.assert_allclose(back, 150.0, atol=3.0)


def test_masked_region_inherits_global(rng):
    img = rng.normal(150.0, 10.0, (256, 256)).astype('f4')
    valid = np.ones_like(img, dtype=bool)
    valid[:128, :128] = False  # fully-masked cell
    res = background_mesh(jnp.array(img), jnp.array(valid), box=128)
    back_mesh = np.array(res['back_mesh'])
    assert back_mesh[0, 0] == pytest.approx(150.0, abs=3.0)
