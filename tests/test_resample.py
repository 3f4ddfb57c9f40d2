"""Lanczos-3 warp tests: identity, shifts, flux conservation, masks."""
import numpy as np
import jax.numpy as jnp
import pytest

from zuds_tpu.ops.resample import (upsample_mapping, warp_image, warp_mask,
                                   warp_image_mask, lanczos3)


def make_grid(H, W, du=0.0, dv=0.0, step=32):
    """Uniform mapping grid: src = dst + (du, dv)."""
    ny = int(np.ceil((H - 1) / step)) + 1
    nx = int(np.ceil((W - 1) / step)) + 1
    gy = np.arange(ny, dtype='f4') * step
    gx = np.arange(nx, dtype='f4') * step
    u = np.broadcast_to(gx[None, :] + du, (ny, nx)).astype('f4')
    v = np.broadcast_to(gy[:, None] + dv, (ny, nx)).astype('f4')
    return u, v


def smooth_image(H, W, rng):
    """Band-limited test image (sum of low-frequency modes + sources)."""
    y, x = np.mgrid[0:H, 0:W]
    img = 150.0 + 5 * np.sin(2 * np.pi * x / 97.0) \
        + 4 * np.cos(2 * np.pi * y / 71.0) \
        + 3 * np.sin(2 * np.pi * (x + y) / 131.0)
    return img.astype('f4')


def test_lanczos_kernel_properties():
    assert lanczos3(jnp.array(0.0)) == pytest.approx(1.0)
    for t in [1.0, 2.0, -1.0, -2.0, 3.0, -3.0, 3.5]:
        assert float(lanczos3(jnp.array(t))) == pytest.approx(0.0, abs=1e-7)
    # partition of unity to ~1e-2 (before renormalization)
    taps = np.arange(-2, 4)
    for frac in [0.0, 0.25, 0.5]:
        s = float(jnp.sum(lanczos3(jnp.array(frac - taps, dtype='f4'))))
        assert s == pytest.approx(1.0, abs=0.02)


def test_upsample_mapping_identity():
    H, W = 128, 96
    u, v = make_grid(H, W, 3.25, -2.5)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    xx = np.arange(W)[None, :]
    yy = np.arange(H)[:, None]
    np.testing.assert_allclose(np.array(uu), np.broadcast_to(xx + 3.25, (H, W)),
                               atol=1e-4)
    np.testing.assert_allclose(np.array(vv), np.broadcast_to(yy - 2.5, (H, W)),
                               atol=1e-4)


def test_warp_identity_exact(rng):
    H, W = 128, 128
    img = smooth_image(H, W, rng)
    u, v = make_grid(H, W)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    out, cov = warp_image(jnp.array(img), uu, vv)
    out = np.array(out)
    inner = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(out[inner], img[inner], rtol=0, atol=2e-4)
    assert np.array(cov)[inner].min() == 1.0
    # edges (incomplete support) are flagged no-coverage
    assert np.array(cov)[0, 0] == 0.0


def test_warp_integer_shift(rng):
    H, W = 128, 128
    img = smooth_image(H, W, rng)
    u, v = make_grid(H, W, du=7.0, dv=-3.0)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    out = np.array(warp_image(jnp.array(img), uu, vv)[0])
    # src = dst + (7, -3); stay clear of the zero-coverage strip the shift
    # pushes out of frame (right edge) and of the roll wraparound
    inner = np.s_[8:-8, 8:-16]
    expected = np.roll(img, shift=(3, -7), axis=(0, 1))
    np.testing.assert_allclose(out[inner], expected[inner], atol=2e-4)


def test_warp_fractional_shift_bandlimited(rng):
    """Half-pixel shift of a band-limited image matches the analytic shift."""
    H, W = 128, 128
    y, x = np.mgrid[0:H, 0:W]
    f = lambda xx, yy: (150 + 10 * np.sin(2 * np.pi * xx / 32.0)
                        + 6 * np.cos(2 * np.pi * yy / 24.0))
    img = f(x, y).astype('f4')
    u, v = make_grid(H, W, du=0.5, dv=0.5)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    out = np.array(warp_image(jnp.array(img), uu, vv)[0])
    expected = f(x + 0.5, y + 0.5)
    inner = np.s_[8:-8, 8:-8]
    np.testing.assert_allclose(out[inner], expected[inner], rtol=0, atol=0.02)


def test_flux_conservation_gaussian():
    """Total flux of a well-sampled source survives a fractional shift."""
    H, W = 96, 96
    y, x = np.mgrid[0:H, 0:W]
    sigma = 2.2
    img = 1000.0 * np.exp(-((x - 48) ** 2 + (y - 48) ** 2) / (2 * sigma ** 2))
    img = img.astype('f4')
    u, v = make_grid(H, W, du=0.37, dv=-0.61)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    out = np.array(warp_image(jnp.array(img), uu, vv)[0])
    assert out[16:-16, 16:-16].sum() == pytest.approx(
        img[16:-16, 16:-16].sum(), rel=1e-4)


def test_warp_mask_or():
    H, W = 64, 64
    mask = np.zeros((H, W), dtype=np.uint16)
    mask[30, 30] = 1 << 8  # saturated pixel
    mask[10, 40] = 1 << 2
    u, v = make_grid(H, W, du=0.5, dv=0.0)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    out = np.array(warp_mask(jnp.array(mask), uu, vv))
    # the saturated bit must propagate to neighbors that draw flux from it
    assert out[30, 29] & (1 << 8)
    assert out[30, 30] & (1 << 8)
    # but not far away
    assert out[30, 20] == 0
    assert out[50, 50] == 0


def test_fused_matches_separate(rng):
    H, W = 96, 96
    img = smooth_image(H, W, rng)
    mask = (rng.random((H, W)) < 0.01).astype(np.uint16) * 4
    u, v = make_grid(H, W, du=1.3, dv=2.7)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    o1, c1 = warp_image(jnp.array(img), uu, vv)
    m1 = warp_mask(jnp.array(mask), uu, vv)
    o2, m2, c2 = warp_image_mask(jnp.array(img), jnp.array(mask), uu, vv)
    np.testing.assert_allclose(np.array(o1), np.array(o2), atol=1e-6)
    np.testing.assert_array_equal(np.array(m1), np.array(m2))
    np.testing.assert_array_equal(np.array(c1), np.array(c2))


def test_shift_warp_matches_gather(rng):
    """Shift-accumulate warp == gather warp for in-window displacements."""
    import jax.numpy as jnp
    from zuds_tpu.ops.resample import warp_shift_image_mask
    H, W = 96, 96
    img = smooth_image(H, W, rng)
    mask = (rng.random((H, W)) < 0.02).astype(np.uint32) * 8
    u, v = make_grid(H, W, du=2.3, dv=-1.6)
    uu, vv = upsample_mapping(jnp.array(u), jnp.array(v), (H, W), 32)
    o1, m1, c1 = warp_image_mask(jnp.array(img), jnp.array(mask), uu, vv)
    o2, m2, c2 = warp_shift_image_mask(jnp.array(img), jnp.array(mask),
                                       uu, vv, window=3)
    np.testing.assert_array_equal(np.array(c1), np.array(c2))
    cov = np.array(c1) > 0
    np.testing.assert_allclose(np.array(o1)[cov], np.array(o2)[cov],
                               atol=2e-4)
    np.testing.assert_array_equal(np.array(m1)[cov], np.array(m2)[cov])


def test_box_mask_or():
    """Separable log-doubling dilation == brute-force window OR, and is a
    superset of the exact per-tap significant-weight mask warp."""
    import jax.numpy as jnp
    from zuds_tpu.ops.resample import box_mask_or

    rng2 = np.random.default_rng(5)
    m = (rng2.random((40, 50)) < 0.03).astype('u4') * 9
    for reach in (1, 3, 7):
        out = np.asarray(box_mask_or(jnp.asarray(m), reach=reach))
        brute = np.zeros_like(m)
        mp = np.pad(m, reach)
        for dy in range(2 * reach + 1):
            for dx in range(2 * reach + 1):
                brute |= mp[dy:dy + 40, dx:dx + 50]
        assert (out == brute).all(), reach


def test_warp_shift_image_matches_masked(rng):
    """Maskless shift warp == the fused variant's image/coverage outputs."""
    import jax.numpy as jnp
    from zuds_tpu.ops.resample import (warp_shift_image,
                                       warp_shift_image_mask)

    H, W = 40, 160
    img = rng.normal(50, 5, (H, W)).astype('f4')
    yy, xx = np.mgrid[0:H, 0:W].astype('f4')
    u = xx - 2.3 + 0.01 * yy
    v = yy + 1.1
    a, cov_a = warp_shift_image(jnp.asarray(img), jnp.asarray(u),
                                jnp.asarray(v), window=4)
    b, _, cov_b = warp_shift_image_mask(
        jnp.asarray(img), jnp.zeros((H, W), jnp.uint32),
        jnp.asarray(u), jnp.asarray(v), window=4)
    assert (np.asarray(cov_a) == np.asarray(cov_b)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_sep_warp_matches_exact_under_rotation(rng):
    """The two-pass separable warp with first-order cross-term correction
    must match the exact shift-accumulate warp to ~1e-5 relative for
    rotations far beyond same-field ZTF alignment (<=0.1 deg)."""
    from zuds_tpu.ops.resample import warp_shift_image, warp_shift_image_sep
    H, W = 256, 256
    img = smooth_image(H, W, rng)
    img[90:101, 110:121] += 4000.0 * np.exp(
        -((np.mgrid[-5:6, -5:6][0] ** 2 + np.mgrid[-5:6, -5:6][1] ** 2)
          / 6.0)).astype('f4')
    th = np.deg2rad(0.1)
    Y, X = np.mgrid[0:H, 0:W].astype('f4')
    cx, cy = W / 2, H / 2
    u = jnp.asarray(cx + np.cos(th) * (X - cx) - np.sin(th) * (Y - cy) + 1.3)
    v = jnp.asarray(cy + np.sin(th) * (X - cx) + np.cos(th) * (Y - cy) - 0.7)
    ref, cov = warp_shift_image(jnp.asarray(img), u, v, window=4)
    out, cov2 = warp_shift_image_sep(jnp.asarray(img), u, v, window=4,
                                     order=1)
    assert np.array_equal(np.asarray(cov), np.asarray(cov2))
    m = np.asarray(cov) > 0
    rel = (np.abs(np.asarray(out) - np.asarray(ref))[m]
           / (np.abs(np.asarray(ref))[m] + 1.0))
    assert rel.max() < 5e-5


def test_fused_sep_warp_matches_parts(rng):
    """Fused sep image+mask warp == (warp_shift_image_sep, warp_shift_mask)
    exactly (shared weight stacks, same interval tap rules)."""
    from zuds_tpu.ops.resample import (warp_shift_image_sep, warp_shift_mask,
                                       warp_shift_sep_image_mask)
    H, W = 128, 128
    img = smooth_image(H, W, rng)
    mask = ((rng.random((H, W)) < 0.01) * 64).astype('i4')
    Y, X = np.mgrid[0:H, 0:W].astype('f4')
    th = np.deg2rad(0.05)
    u = jnp.asarray(X + 2.1 + 0.5 * np.sin(Y / 40) - th * (Y - H / 2))
    v = jnp.asarray(Y - 1.4 + 0.3 * np.cos(X / 30) + th * (X - W / 2))
    mj = jnp.asarray(mask)
    a, ca = warp_shift_image_sep(jnp.asarray(img), u, v, window=4, order=1)
    m = warp_shift_mask(mj, u, v, window=4)
    f_img, f_mask, f_cov = warp_shift_sep_image_mask(
        jnp.asarray(img), mj, u, v, window=4, order=1)
    assert np.array_equal(np.asarray(ca), np.asarray(f_cov))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(f_img))
    # mask rule: identical outside coverage zeroing
    np.testing.assert_array_equal(
        np.asarray(jnp.where(ca > 0, m, 0)), np.asarray(f_mask))
