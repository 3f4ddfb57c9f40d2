"""Golden-stamp regression tests (the reference's pattern:
zuds/tests/suite/test_stack.py:9-28, test_sub.py:9-37 pin exact output
stamps). Deterministic synthetic fixtures; goldens live in tests/data and
regenerate via ZUDS_REGEN_GOLDEN=1.
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'data')
TOL = dict(rtol=2e-3, atol=2e-3)   # float32 + platform headroom


def _fixture():
    # PIN the fit ridge: with only 25 stamps the golden kernel coefficients
    # move materially with the regularization (r4 lesson: a 1e-7 -> 1e-5
    # default change silently invalidated the goldens). The golden compares
    # a fixed configuration, not the shipping default. Restored on exit so
    # other tests in the process see the true defaults.
    saved = {k: os.environ.get(k)
             for k in ('ZUDS_FIT_RIDGE', 'ZUDS_FIT_RIDGE_GROWTH')}
    os.environ['ZUDS_FIT_RIDGE'] = '1e-5'
    os.environ['ZUDS_FIT_RIDGE_GROWTH'] = '8'
    try:
        return _fixture_inner()
    finally:
        for k, val in saved.items():
            if val is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = val


def _fixture_inner():
    import jax.numpy as jnp
    from zuds_tpu.ops.subtract import KernelBasis, fit_kernel, apply_kernel
    from zuds_tpu.ops.coadd import clipped_coadd

    rng = np.random.default_rng(20260816)
    H = W = 160
    yy, xx = np.mgrid[0:H, 0:W]
    xs = rng.uniform(20, W - 20, 25)
    ys = rng.uniform(20, H - 20, 25)
    fl = rng.uniform(5000, 30000, 25)

    def render(sig):
        img = np.zeros((H, W))
        for x, y, f in zip(xs, ys, fl):
            img += f * np.exp(-((xx - x) ** 2 + (yy - y) ** 2)
                              / (2 * sig ** 2)) / (2 * np.pi * sig ** 2)
        return img

    ref = (render(1.5) + rng.normal(0, 2.0, (H, W))).astype('f4')
    sci = (render(2.2) + rng.normal(0, 2.0, (H, W))).astype('f4')

    basis = KernelBasis(11, seeing_sigma=2.2 / 2.355)
    sv = np.ones(25, bool)
    fit = fit_kernel(jnp.asarray(ref), jnp.asarray(sci),
                     jnp.full((H, W), 1 / 8.0, dtype='f4'),
                     jnp.asarray(xs.astype('f4')),
                     jnp.asarray(ys.astype('f4')), jnp.asarray(sv),
                     basis.gx, basis.gy, basis.sums,
                     jnp.asarray(basis.b0_2d), stamp=31, order=1, nreg=1)
    model = apply_kernel(jnp.asarray(ref), fit['coeffs'], basis.gx,
                         basis.gy, basis.sums, jnp.asarray(basis.b0_2d),
                         order=1, nreg=1)
    sub_stamp = np.array(sci - np.array(model))[77:83, 77:83]

    stack = jnp.stack([jnp.asarray(ref)] * 4) \
        + jnp.asarray(rng.normal(0, 1.0, (4, H, W)).astype('f4'))
    weights = jnp.full((4, H, W), 1 / 4.0, dtype='f4')
    out = clipped_coadd(stack, weights)
    coadd_stamp = np.array(out['coadd'])[77:83, 77:83]
    return {'sub_stamp': sub_stamp, 'coadd_stamp': coadd_stamp,
            'kernel_coeff0': np.array(fit['coeffs'])[0, :4]}


@pytest.fixture(scope='module')
def produced():
    return _fixture()


@pytest.mark.parametrize('key', ['sub_stamp', 'coadd_stamp',
                                 'kernel_coeff0'])
def test_golden(produced, key):
    path = os.path.join(GOLDEN_DIR, 'golden_ops.npz')
    if os.environ.get('ZUDS_REGEN_GOLDEN') == '1' or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **_fixture())
        pytest.skip('golden regenerated; rerun to compare')
    golden = np.load(path)
    scale = max(1.0, float(np.abs(golden[key]).max()))
    np.testing.assert_allclose(produced[key], golden[key],
                               rtol=TOL['rtol'],
                               atol=TOL['atol'] * scale)
