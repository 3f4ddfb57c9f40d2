"""Ridge-bias bound for the A&L kernel fit (VERDICT r4 item 6).

The shipping fit regularizes with a Jacobi-scaled, order-weighted ridge
(base 1e-5, growth 8 — ops/subtract.py:fit_kernel). This suite bounds the
BIAS that prior introduces on well-constrained fits by comparing the
ridged f32 device fit against an UNREGULARIZED float64 normal-equations
oracle on the same stamps, sweeping stamp count {8, 16, 40, 100} x
spatial order {2, 4}:

* photometric parity: the B0 (flux-ratio) field evaluated at the stamp
  centers must agree to <1 mmag — the ridge must not bias photometry;
* model parity: the fitted model on the stamp interiors must agree to
  <1e-3 relative RMS — the ridge only pins near-null directions.

Marginal regime (measured r5, CPU backend, defaults ridge 1e-5 growth
4): when the surviving stamp POSITIONS barely cover the spatial term
count, the deviation from the float64 oracle is CONDITIONING-dominated,
not ridge-dominated — shrinking the ridge makes it WORSE (at (2, 8):
0.62% at 1e-5/8 but 5.9% at 1e-9/0). Those configs get looser,
measured-with-headroom bounds and stay in the suite as canaries:
  (2, 8)  — 7 survivors for 6 terms:  b0 field within 1.5e-2
  (4, 16) — 13 survivors for 15 terms: b0 field within 6e-3
Fully prior-dominated (order 4, 8 stamps — 15 terms, 8 positions): the
unregularized problem is rank-deficient; there we assert only that the
ridged fit stays DATA-consistent (on-stamp residuals at the noise
level) and photometry near truth. Reference context: hotpants counters
the same instability with ~100 substamps/region (zuds/hotpants.py:83-88)
and offers no regularization knob at all.
"""
import numpy as np
import pytest

MMAG = 1e-3 * np.log(10) / 2.5


S_CAP = 100          # fixed stamp capacity -> one jit compile per order
KSIZE = 13
STAMP = 27           # Pi = 15: 225 valid-conv rows per stamp


def _scene(order, rng):
    """Scene with a genuinely spatially-varying kernel: sci is built from
    (B_n * ref) planes scaled by per-pixel polynomial coefficient fields,
    so both fits face identical, physically sensible data."""
    from scipy.signal import fftconvolve
    from zuds_tpu.ops.subtract import KernelBasis, spatial_terms

    H = W = 320
    yy, xx = np.mgrid[0:H, 0:W]
    nsrc = 120
    sx = rng.uniform(20, W - 20, nsrc)
    sy = rng.uniform(20, H - 20, nsrc)
    fl = rng.uniform(5e3, 5e4, nsrc)
    ref = np.full((H, W), 100.0)
    for x, y, f in zip(sx, sy, fl):
        ref += f * np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 1.5 ** 2)
                          ) / (2 * np.pi * 1.5 ** 2)
    ref += rng.normal(0, 2.0, (H, W))

    basis = KernelBasis(KSIZE, seeing_sigma=2.2 / 2.355)
    dense = np.asarray(basis.dense(), float)
    terms = spatial_terms(order)
    # active truth: photometric scale + linear spatial variation on B0,
    # plus a PSF-shape term — exercised but slowly varying
    truth = {(0, 0): 1.13}
    if len(terms) > 1:
        truth[(0, 1)] = 0.03
        truth[(0, 2)] = -0.02
    truth[(5, 0)] = 0.04
    xn = (xx - W / 2) / (W / 2)
    yn = (yy - H / 2) / (H / 2)
    tfield = {m: (xn ** p) * (yn ** q) for m, (p, q) in enumerate(terms)}
    sci = np.full((H, W), 30.0)
    for (n, m), a in truth.items():
        conv = fftconvolve(ref, dense[n][::-1, ::-1], mode='same')
        sci += a * tfield[m] * conv
    sci += rng.normal(0, 2.0, (H, W))
    return ref, sci, basis, dense, terms, (H, W)


def _oracle_fit(ref, sci, ivar, xs, ys, dense, terms, shape):
    """Unregularized float64 normal-equations fit, identical model and
    spatial-term normalization (nreg=1) to fit_kernel."""
    from numpy.lib.stride_tricks import sliding_window_view
    H, W = shape
    Nb, K, _ = dense.shape
    P = STAMP
    Pi = P - K + 1
    Nm = len(terms)
    D = Nb * Nm + 1
    G = np.zeros((D, D))
    h = np.zeros(D)
    off = K // 2
    for x, y in zip(xs, ys):
        x0 = int(round(x)) - P // 2
        y0 = int(round(y)) - P // 2
        R = ref[y0:y0 + P, x0:x0 + P].astype(float)
        S = sci[y0 + off:y0 + off + Pi, x0 + off:x0 + off + Pi].ravel()
        Wt = ivar[y0 + off:y0 + off + Pi,
                  x0 + off:x0 + off + Pi].ravel()
        windows = sliding_window_view(R, (K, K))
        C = np.einsum('ijkl,nkl->nij', windows, dense).reshape(Nb, -1)
        xnn = (x - W / 2) / (W / 2)
        ynn = (y - H / 2) / (H / 2)
        T = np.array([(xnn ** p) * (ynn ** q) for p, q in terms])
        F = np.concatenate([(C[:, None, :] * T[None, :, None]
                             ).reshape(Nb * Nm, -1),
                            np.ones((1, Pi * Pi))], axis=0)   # (D, npix)
        G += (F * Wt[None]) @ F.T
        h += F @ (Wt * S)
    coeffs, *_ = np.linalg.lstsq(G, h, rcond=None)
    return coeffs


def _device_fit(ref, sci, ivar, xs, ys, basis, order):
    import jax.numpy as jnp
    from zuds_tpu.ops.subtract import fit_kernel
    # pad to the fixed capacity so every stamp count shares one compile
    S = len(xs)
    xs_p = np.concatenate([xs, np.full(S_CAP - S, 40.0)]).astype('f4')
    ys_p = np.concatenate([ys, np.full(S_CAP - S, 40.0)]).astype('f4')
    sv = np.zeros(S_CAP, bool)
    sv[:S] = True
    fit = fit_kernel(jnp.asarray(ref, jnp.float32),
                     jnp.asarray(sci, jnp.float32),
                     jnp.asarray(ivar, jnp.float32),
                     jnp.asarray(xs_p), jnp.asarray(ys_p), jnp.asarray(sv),
                     basis.gx, basis.gy, basis.sums,
                     jnp.asarray(basis.b0_2d), stamp=STAMP, order=order,
                     nreg=1)
    return (np.asarray(fit['coeffs'])[0].astype(float),
            np.asarray(fit['stamp_ok'])[:S])


def _b0_field(coeffs, terms, xs, ys, shape):
    """Kernel-sum (photometric flux-ratio) field at positions: only B0
    carries it (sum-normalized basis)."""
    H, W = shape
    Nm = len(terms)
    a0 = coeffs[:Nm]                     # B0 row of the (Nb, Nm) block
    xnn = (np.asarray(xs) - W / 2) / (W / 2)
    ynn = (np.asarray(ys) - H / 2) / (H / 2)
    T = np.stack([(xnn ** p) * (ynn ** q) for p, q in terms])
    return a0 @ T


def _model_on_stamps(coeffs, ref, dense, terms, xs, ys, shape):
    from numpy.lib.stride_tricks import sliding_window_view
    H, W = shape
    Nb, K, _ = dense.shape
    P = STAMP
    Pi = P - K + 1
    Nm = len(terms)
    out = []
    for x, y in zip(xs, ys):
        x0 = int(round(x)) - P // 2
        y0 = int(round(y)) - P // 2
        R = ref[y0:y0 + P, x0:x0 + P].astype(float)
        windows = sliding_window_view(R, (K, K))
        C = np.einsum('ijkl,nkl->nij', windows, dense).reshape(Nb, -1)
        xnn = (x - W / 2) / (W / 2)
        ynn = (y - H / 2) / (H / 2)
        T = np.array([(xnn ** p) * (ynn ** q) for p, q in terms])
        a = coeffs[:Nb * Nm].reshape(Nb, Nm) @ T
        out.append(a @ C + coeffs[-1])
    return np.stack(out)


@pytest.mark.parametrize('order,nstamp,b0_tol,model_tol', [
    # well-constrained: <1 mmag photometric, <2e-3 model RMS
    (2, 16, MMAG, 2e-3), (2, 40, MMAG, 2e-3), (2, 100, MMAG, 2e-3),
    (4, 40, MMAG, 2e-3), (4, 100, MMAG, 2e-3),
    # marginal (survivors ~ term count): conditioning-dominated —
    # measured r5 values 6.2e-3 / 2.7e-3, asserted with ~2x headroom
    (2, 8, 1.5e-2, 5e-3), (4, 16, 6e-3, 4e-3),
])
def test_ridge_bias_bounded(order, nstamp, b0_tol, model_tol):
    """Ridged f32 device fit vs unregularized float64 oracle: <1 mmag
    photometric bias and bounded model deviation on well-constrained
    fits; measured conditioning-limited bounds on marginal ones."""
    rng = np.random.default_rng(20260821)
    ref, sci, basis, dense, terms, shape = _scene(order, rng)
    H, W = shape
    ivar = np.full((H, W), 1 / 8.0)
    # jittered grid placement: good spatial spread at every count
    side = int(np.ceil(np.sqrt(nstamp)))
    g = np.linspace(30, W - 30, side)
    xs, ys = [], []
    for j in range(side):
        for i in range(side):
            if len(xs) < nstamp:
                xs.append(g[i] + rng.uniform(-6, 6))
                ys.append(g[j] + rng.uniform(-6, 6))
    xs = np.asarray(xs)
    ys = np.asarray(ys)

    coeffs_dev, ok = _device_fit(ref, sci, ivar, xs, ys, basis, order)
    assert ok.sum() >= max(3, int(0.6 * nstamp))   # clean scene: few rejects
    xs_k, ys_k = xs[ok], ys[ok]
    coeffs_ora = _oracle_fit(ref, sci, ivar, xs_k, ys_k, dense, terms,
                             shape)

    f_dev = _b0_field(coeffs_dev, terms, xs_k, ys_k, shape)
    f_ora = _b0_field(coeffs_ora, terms, xs_k, ys_k, shape)
    m_dev = _model_on_stamps(coeffs_dev, ref, dense, terms, xs_k, ys_k,
                             shape)
    m_ora = _model_on_stamps(coeffs_ora, ref, dense, terms, xs_k, ys_k,
                             shape)
    mscale = np.sqrt(np.mean(m_ora ** 2))

    np.testing.assert_allclose(f_dev, f_ora, rtol=b0_tol, atol=0)
    assert np.sqrt(np.mean((m_dev - m_ora) ** 2)) / mscale < model_tol
    # the truth check (both fits recover the planted photometric scale):
    # the constant B0 term is the field's mean over the symmetric stamp
    # set. SANITY bound only (1%): the scene renders spatial terms at
    # per-PIXEL coordinates while the fit models them at stamp centers,
    # a legitimate ~0.5% model-adequacy gap both fits share — the
    # oracle-parity asserts above are the precision statement.
    assert abs(np.mean(f_dev) / 1.13 - 1.0) < 1e-2


def test_ridge_prior_dominated_regime_stays_data_consistent():
    """order 4, 8 stamps: Nm=15 > 8 positions — the unregularized problem
    is rank-deficient and the ridge prior legitimately resolves the null
    space. The requirement is weaker: the ridged fit must remain DATA
    consistent (on-stamp residual RMS at the noise level) and the
    photometric field must stay near truth at the stamp centers."""
    order, nstamp = 4, 8
    rng = np.random.default_rng(20260821)
    ref, sci, basis, dense, terms, shape = _scene(order, rng)
    H, W = shape
    ivar = np.full((H, W), 1 / 8.0)
    g = np.linspace(30, W - 30, 3)
    xs, ys = [], []
    for j in range(3):
        for i in range(3):
            if len(xs) < nstamp:
                xs.append(g[i] + rng.uniform(-6, 6))
                ys.append(g[j] + rng.uniform(-6, 6))
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    coeffs_dev, ok = _device_fit(ref, sci, ivar, xs, ys, basis, order)
    xs_k, ys_k = xs[ok], ys[ok]
    m_dev = _model_on_stamps(coeffs_dev, ref, dense, terms, xs_k, ys_k,
                             shape)
    # on-stamp data consistency: residual RMS within 2x the pixel noise
    P, K = STAMP, KSIZE
    Pi = P - K + 1
    off = K // 2
    resid = []
    for (x, y), m in zip(zip(xs_k, ys_k), m_dev):
        x0 = int(round(x)) - P // 2
        y0 = int(round(y)) - P // 2
        S = sci[y0 + off:y0 + off + Pi, x0 + off:x0 + off + Pi].ravel()
        resid.append(S - m)
    rms = np.sqrt(np.mean(np.concatenate(resid) ** 2))
    assert rms < 2.0 * np.sqrt(8.0)
    f_dev = _b0_field(coeffs_dev, terms, xs_k, ys_k, shape)
    # photometry at the stamps stays within 1% of the planted field even
    # though the high-order terms are prior-dominated
    xnn = (xs_k - W / 2) / (W / 2)
    ynn = (ys_k - H / 2) / (H / 2)
    # term order (spatial_terms): m=1 -> (p,q)=(0,1) = yn, m=2 -> xn
    f_true = 1.13 + 0.03 * ynn - 0.02 * xnn
    np.testing.assert_allclose(f_dev, f_true, rtol=0.01)
