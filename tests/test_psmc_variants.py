"""Monte-Carlo PS estimator variants: PSMonteCarloAlt, CrossPower, PSExact.

Cross-validates the three Fisher estimation strategies on one small
product set: the MC sample-covariance Fisher, the stochastic-trace
variant, and the exact band-projection Fisher must agree statistically
(the reference's functional test uses rel 3e-2 tolerances against golden
MC products; here the exact Fisher is the anchor).
"""

import os

import numpy as np
import pytest

from driftscan_tpu.core import manager

CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           Yes
    output_directory:   "{outdir}"
    truncate:           false

telescope:
    type:               UnpolarisedCylinder
    num_freq:           3
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0

kltransform:
    -   type:           KLTransform
        name:           kl
        use_thermal:    Yes
        use_foregrounds: No

psfisher:
    -   type:           Full
        name:           psx
        klname:         kl
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3

    -   type:           MonteCarlo
        name:           psmc
        klname:         kl
        nsamples:       1500
        seed:           7
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3

    -   type:           MonteCarloAlt
        name:           psalt
        klname:         kl
        nsamples:       1500
        seed:           7
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3

    -   type:           Cross
        name:           pscross
        klname:         kl
        nsamples:       600
        seed:           7
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3
"""


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("psmc_variants")
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(CONFIG.format(outdir=f"{base}/testdir"))
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def _total_fisher(ps):
    fisher, bias = ps.fisher_bias()
    return np.asarray(fisher).real, np.asarray(bias).real


def test_mc_matches_exact(products):
    """Sample-covariance MC Fisher ~ exact Fisher (statistical agreement)."""
    f_exact, _ = _total_fisher(products.psestimators["psx"])
    f_mc, _ = _total_fisher(products.psestimators["psmc"])

    scale = np.abs(f_exact).max()
    assert scale > 0
    # 1500 samples per m -> a few percent on the dominant entries
    np.testing.assert_allclose(f_mc, f_exact, rtol=0.35, atol=0.15 * scale)


def test_alt_matches_exact(products):
    """Stochastic-trace Fisher ~ exact Fisher on the dominant entries."""
    f_exact, _ = _total_fisher(products.psestimators["psx"])
    f_alt, _ = _total_fisher(products.psestimators["psalt"])

    scale = np.abs(f_exact).max()
    np.testing.assert_allclose(f_alt, f_exact, rtol=0.35, atol=0.15 * scale)
    # Gram-structured: symmetric PSD by construction
    np.testing.assert_allclose(f_alt, f_alt.T, atol=1e-12 * scale)
    assert np.linalg.eigvalsh(f_alt).min() > -1e-8 * scale


def test_crosspower_fisher(products):
    """CrossPower produces a finite symmetric Fisher and a noise bias row."""
    ps = products.psestimators["pscross"]
    assert ps.crosspower is True
    fisher, bias = _total_fisher(ps)
    assert fisher.shape == (ps.nbands, ps.nbands)
    assert bias.shape == (ps.nbands,)
    assert np.isfinite(fisher).all() and np.isfinite(bias).all()
    np.testing.assert_allclose(fisher, fisher.T, atol=1e-12)


def test_seeded_determinism(products):
    """Fixed seed -> identical Fisher/bias on recomputation, for each kind."""
    for name in ("psmc", "psalt", "pscross"):
        ps = products.psestimators[name]
        ps.genbands()
        f1, b1 = ps._work_fisher_bias_m(1)
        f2, b2 = ps._work_fisher_bias_m(1)
        np.testing.assert_allclose(f1, f2)
        np.testing.assert_allclose(b1, b2)
