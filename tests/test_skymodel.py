import numpy as np
import pytest

from driftscan_tpu.core import cosmology, skymodel

FREQS = np.linspace(400.0, 450.0, 4)
LMAX = 24


def test_cosmology_background():
    c = cosmology.default_cosmology()
    assert c.E(0) == pytest.approx(1.0)
    # Distances increase with z, sensible magnitudes
    chis = np.asarray(c.comoving_distance(np.array([0.5, 1.0, 2.0])))
    assert np.all(np.diff(chis) > 0)
    assert 1500 < chis[0] < 2500  # ~1940 Mpc for Planck-ish params
    # Growth factor decreasing in z, D(0)=1
    assert c.growth_factor(0.0) == pytest.approx(1.0, abs=1e-3)
    assert 0.3 < c.growth_factor(2.0) < 0.6
    # Growth rate between matter and lambda domination limits
    assert 0.4 < c.growth_rate(0.0) < 0.6
    assert c.growth_rate(5.0) > 0.95


def test_matter_powerspectrum_sigma8():
    c = cosmology.default_cosmology()
    k = np.logspace(-4, 2, 4096)
    R = 8.0 / c.h
    x = k * R
    W = 3.0 * (np.sin(x) - x * np.cos(x)) / x**3
    s8sq = np.trapezoid(c.matter_powerspectrum(k) * W**2 * k**2 / (2 * np.pi**2), k)
    assert np.sqrt(s8sq) == pytest.approx(c.sigma8, rel=1e-3)
    # Power spectrum has a turnover
    pk = c.matter_powerspectrum(np.array([1e-3, 2e-2, 1.0]))
    assert pk[1] > pk[0] and pk[1] > pk[2]


def test_foreground_model_structure():
    cv = skymodel.foreground_model(LMAX, FREQS, npol=4)
    assert cv.shape == (4, 4, LMAX + 1, 4, 4)
    # Positive semi-definite in frequency at each l > 0 for TT
    for li in [1, 10, LMAX]:
        evs = np.linalg.eigvalsh(cv[0, 0, li])
        assert evs.min() > -1e-12 * evs.max()
    # Decreasing in l
    assert cv[0, 0, 2, 0, 0] > cv[0, 0, 20, 0, 0]
    # Monopole zeroed
    assert cv[0, 0, 0].max() == 0.0
    # Polarised part present but weaker and decorrelates faster in freq
    assert cv[1, 1, 10, 0, 0] > 0
    ratio_t = cv[0, 0, 10, 0, -1] / cv[0, 0, 10, 0, 0]
    ratio_p = cv[1, 1, 10, 0, -1] / cv[1, 1, 10, 0, 0]
    assert ratio_p < ratio_t
    # V and cross terms zero
    assert cv[3, 3].max() == 0.0
    assert cv[0, 1].max() == 0.0


def test_im21cm_model_structure():
    cv = skymodel.im21cm_model(LMAX, FREQS, npol=1)
    assert cv.shape == (1, 1, LMAX + 1, 4, 4)
    ct = cv[0, 0]
    # Symmetric in the frequency indices
    np.testing.assert_allclose(ct, np.swapaxes(ct, -1, -2), rtol=1e-8, atol=1e-20)
    # Diagonal positive
    for li in [1, 8, LMAX]:
        d = np.diagonal(ct[li])
        assert np.all(d > 0)
        # Frequency correlation decreases away from the diagonal
        assert abs(ct[li, 0, -1]) < ct[li, 0, 0]
    # Signal much smaller than foregrounds (mK^2 vs K^2 regime)
    fg = skymodel.foreground_model(LMAX, FREQS, npol=1)
    assert ct[10, 0, 0] < 1e-3 * fg[0, 0, 10, 0, 0]


def test_corr21cm_band_spectrum():
    """The unit-band construction used by the PS estimator."""
    cr = skymodel.Corr21cm()

    def band(k, mu):
        return ((k >= 0.05) & (k < 0.15)).astype(np.float64)

    pk_band = lambda k, mu: cr.ps_vv(k) * band(k, mu)
    crt = skymodel.Corr21cm(ps=pk_band, redshift=1.5)
    crt.ps_2d = True
    cl_band = skymodel.clarray(crt.angular_powerspectrum, LMAX, FREQS)
    assert cl_band.shape == (LMAX + 1, 4, 4)
    assert np.isfinite(cl_band).all()
    assert np.abs(np.diagonal(cl_band, axis1=1, axis2=2)).max() > 0


def test_temponly():
    ct = skymodel.im21cm_model(LMAX, FREQS, npol=4, temponly=True)
    assert ct.shape == (LMAX + 1, 4, 4)
