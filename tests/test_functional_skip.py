"""Functional test of the skip_freq / skip_baselines / skip_pol features
(the analogue of the reference's tests/test_functional_skip.py): skipped
entries must be present but exactly zero, and the projections must remain
consistent."""

import os

import h5py
import numpy as np
import pytest

from driftscan_tpu.core import manager

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow



SKIP_FREQ = [0, 2]
SKIP_BASELINES = [1, 3]


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("skipf")
    conf = f"""
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           No
    output_directory:   "{base}/testdir"
    polsvcut:           1.0

telescope:
    type:               PolarisedCylinder
    num_freq:           4
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0
    skip_freq:          {SKIP_FREQ}
    skip_baselines:     {SKIP_BASELINES}
    skip_pol:           Yes

kltransform:
    -   type:           KLTransform
        name:           kl
        use_thermal:    Yes
        use_foregrounds: No
"""
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(conf)
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def test_included_indices(products):
    tel = products.telescope
    assert list(tel.included_freq) == [
        i for i in range(tel.nfreq) if i not in SKIP_FREQ
    ]
    assert list(tel.included_baseline) == [
        i for i in range(tel.nbase) if i not in SKIP_BASELINES
    ]
    assert list(tel.included_pol) == [0]  # skip_pol


def test_beam_m_zeros(products):
    """Skipped frequencies/baselines/pols re-inflate as exact zeros."""
    bt = products.beamtransfer
    mi = 1
    bm = bt.beam_m(mi)  # (nfreq, 2, nbase, npol, lmax+1)

    for fi in SKIP_FREQ:
        assert np.abs(bm[fi]).max() == 0.0
    for bi in SKIP_BASELINES:
        assert np.abs(bm[:, :, bi]).max() == 0.0
    # skip_pol: Q, U, V zero everywhere
    assert np.abs(bm[:, :, :, 1:]).max() == 0.0
    # But the included entries are non-trivial
    inc_f = products.telescope.included_freq
    inc_b = products.telescope.included_baseline
    assert np.abs(bm[np.ix_(inc_f, [0, 1], inc_b)][..., 0, :]).max() > 0


def test_file_layout_compact(products):
    """On disk only the included entries are stored."""
    bt = products.beamtransfer
    tel = products.telescope
    mi = 1
    with h5py.File(bt._mfile(mi), "r") as f:
        assert f["beam_m"].shape == (
            len(tel.included_freq),
            2,
            len(tel.included_baseline),
            len(tel.included_pol),
            tel.lmax + 1 - mi,
        )


def test_projection_consistency(products):
    """Forward projection of a sky vector ignores exactly the skipped parts."""
    bt = products.beamtransfer
    tel = products.telescope
    mi = 1
    rng = np.random.default_rng(0)
    vec = rng.standard_normal(
        (tel.nfreq, tel.num_pol_sky, tel.lmax + 1)
    ) + 1j * rng.standard_normal((tel.nfreq, tel.num_pol_sky, tel.lmax + 1))

    tvec = bt.project_vector_sky_to_telescope(mi, vec).reshape(
        tel.nfreq, 2, tel.npairs
    )

    # Skipped frequencies and baselines produce zero visibilities
    for fi in SKIP_FREQ:
        assert np.abs(tvec[fi]).max() == 0.0
    for bi in SKIP_BASELINES:
        assert np.abs(tvec[:, :, bi]).max() == 0.0

    # Zeroing the skipped parts of the input changes nothing
    vec2 = vec.copy()
    for fi in SKIP_FREQ:
        vec2[fi] = 0.0
    vec2[:, 1:] = 0.0
    tvec2 = bt.project_vector_sky_to_telescope(mi, vec2)
    np.testing.assert_allclose(tvec.reshape(tel.nfreq, -1), tvec2, atol=1e-12)


def test_kl_runs_with_skips(products):
    kl = products.kltransforms["kl"]
    evals, evecs = kl.modes_m(1)
    if evals is not None:
        assert np.isfinite(evals).all()
    assert os.path.exists(kl.evdir + "/evals.hdf5")
