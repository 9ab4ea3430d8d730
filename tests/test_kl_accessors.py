"""KL accessor surface and cartesian-band PS estimation.

Covers the API the reference exposes but the other suites don't touch:
`invmodes_m`, `skymodes_m`, `project_sky`, and the cartesian band
parameterisation of the quadratic estimator
(/root/reference/drift/core/kltransform.py:502-570,872 and
psestimation.py:44-55,340-360).
"""

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
        subset:         No
        threshold:      -1.0e30
        inverse:        Yes

psfisher:
    -   type:           Full
        name:           pscart
        klname:         kl
        bandtype:       cartesian
        kpar_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.2
            num:        3
        kperp_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.2
            num:        2
"""


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("kl_accessors")
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(CONFIG.format(outdir=f"{base}/testdir"))
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def test_invmodes_matches_cached_inverse(products):
    kl = products.kltransforms["kl"]
    mi = 1
    evals, evecs = kl.modes_m(mi)
    inv = kl.invmodes_m(mi)
    # the cached inverse satisfies evecs @ inv.T ~ I on the mode space
    g = np.asarray(evecs) @ np.asarray(inv)
    np.testing.assert_allclose(g, np.eye(g.shape[0]), atol=1e-8)


def test_skymodes_shape(products):
    kl = products.kltransforms["kl"]
    bt = products.beamtransfer
    mi = 1
    evsky = kl.skymodes_m(mi)
    evals, _ = kl.modes_m(mi)
    assert evsky.shape == (evals.size, bt.nfreq, bt.nsky)
    assert np.isfinite(evsky).all()


def test_project_sky_roundtrip(products):
    """project_sky must equal the per-m sky->KL projection."""
    kl = products.kltransforms["kl"]
    tel = products.telescope
    lmax = tel.lmax
    rng = np.random.default_rng(3)

    shape = (tel.nfreq, tel.num_pol_sky, lmax + 1, lmax + 1)
    alm = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)

    proj = kl.project_sky(alm, harmonic=True)
    nmodes = kl.beamtransfer.nfreq * kl.beamtransfer.ntel
    assert proj.shape == (2 * tel.mmax + 1, nmodes)

    for mi in (0, 2):
        direct = kl.project_vector_sky_to_kl(mi, alm[..., mi])
        np.testing.assert_allclose(
            proj[mi, -direct.size :], direct, rtol=1e-10, atol=1e-12
        )


def test_cartesian_fisher(products):
    ps = products.psestimators["pscart"]
    fisher, bias = ps.fisher_bias()
    # (3 kpar edges -> 2 cells) x (2 kperp edges -> 1 cell) = 2 bands
    assert fisher.shape == (2, 2)
    assert np.isfinite(fisher).all()

    import h5py

    with h5py.File(ps.psdir + "/fisher.hdf5", "r") as f:
        assert f.attrs["bandtype"] == b"cartesian"
        for key in (
            "kpar_start", "kpar_end", "kpar_center",
            "kperp_start", "kperp_end", "kperp_center",
            "kpar_bands", "kperp_bands",
        ):
            assert key in f
