"""Timestream pipeline tests: simulate -> m-modes -> maps -> power spectrum.

Exercises the reference workflow of /root/reference/drift/pipeline/
timestream.py end to end with a noiseless simulation, checking the m-mode
round trip against direct BTM projections.
"""

import os

import h5py
import numpy as np
import pytest

from driftscan_tpu.core import manager
from driftscan_tpu.ops import sht
from driftscan_tpu.pipeline import timestream


CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           Yes
    output_directory:   "{out}"
    nosvd:              Yes

telescope:
    type:               UnpolarisedCylinder
    num_freq:           2
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0
    ndays:              733

kltransform:
    -   type:           KLTransform
        name:           kl
        inverse:        Yes
        subset:         No
        threshold:      -1.0e30

psfisher:
    -   type:           MonteCarlo
        name:           ps1
        klname:         kl
        nsamples:       50
        seed:           11
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3
"""


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("ts")
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(CONFIG.format(out=str(base / "prod")))
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


@pytest.fixture(scope="module")
def skymap_file(products, tmp_path_factory):
    """A random band-limited sky map stored like a cora map file."""
    tel = products.telescope
    rng = np.random.default_rng(99)
    lmax = tel.lmax
    nside = 16

    ls = np.arange(lmax + 1)[:, None]
    ms = np.arange(lmax + 1)[None, :]
    alm = rng.standard_normal(
        (tel.nfreq, lmax + 1, lmax + 1)
    ) + 1j * rng.standard_normal((tel.nfreq, lmax + 1, lmax + 1))
    alm = np.where(ms <= ls, alm, 0)
    alm[:, :, 0] = alm[:, :, 0].real

    skymap = np.asarray(sht.synthesis_real(alm, nside))

    base = tmp_path_factory.mktemp("maps")
    path = str(base / "skymap.hdf5")
    with h5py.File(path, "w") as f:
        f.create_dataset("map", data=skymap[:, np.newaxis, :])  # [freq, pol, pix]
    return path


@pytest.fixture(scope="module")
def tstream(products, skymap_file, tmp_path_factory):
    base = tmp_path_factory.mktemp("tsdir")
    ts = timestream.simulate(
        products, str(base / "ts"), maps=[skymap_file], ndays=0
    )
    return ts


def test_simulate_outputs(tstream, products):
    tel = products.telescope
    assert os.path.exists(tstream._ffile(0))
    assert tstream.ntime == 2 * tel.mmax + 1
    tsdata = tstream.timestream_f(0)
    assert tsdata.shape == (tel.npairs, tstream.ntime)
    assert np.isfinite(tsdata).all()
    assert np.abs(tsdata).max() > 0
    # Telescope layout datasets stored alongside
    with h5py.File(tstream._ffile(0), "r") as f:
        assert "feedmap" in f and "baselines" in f


def test_mmodes_match_direct_projection(tstream, products, skymap_file):
    """FFT-recovered m-modes must equal the direct BTM projection of the
    input sky's alm (noiseless simulation -> exact to roundoff)."""
    tel = products.telescope
    bt = products.beamtransfer

    tstream.generate_mmodes()

    with h5py.File(skymap_file, "r") as f:
        skymap = f["map"][:]

    alm = sht.sphtrans_sky(skymap[:, 0], lmax=tel.lmax)  # (freq, l, m)

    for mi in [0, 1, tel.mmax]:
        mmode = tstream.mmode(mi)  # (nfreq, 2, npairs)
        direct = bt.project_vector_sky_to_telescope(
            mi, alm[:, np.newaxis, :, mi]
        ).reshape(tel.nfreq, 2, tel.npairs)
        np.testing.assert_allclose(mmode, direct, atol=1e-8)


def test_svd_and_kl_modes(tstream, products):
    tstream.generate_mmodes_svd()
    svdm = tstream.mmode_svd(1)
    assert svdm.shape[0] == products.beamtransfer.ndof(1)

    tstream.set_kltransform("kl")
    tstream.generate_mmodes_kl()
    klm = tstream.mmode_kl(1)
    assert np.isfinite(klm).all()

    tstream.collect_mmodes_kl()
    fname = tstream.output_directory + "/klmodes_kl_%f.hdf5" % tstream.klthreshold
    assert os.path.exists(fname)


def test_mapmake_full(tstream, products):
    tstream.mapmake_full(16, "map_full.hdf5")
    with h5py.File(tstream.output_directory + "/map_full.hdf5", "r") as f:
        skymap = f["map"][:]
    tel = products.telescope
    assert skymap.shape == (tel.nfreq, tel.num_pol_sky, 12 * 16**2)
    assert np.isfinite(skymap).all()
    assert np.abs(skymap).max() > 0


def test_mapmake_svd(tstream, products):
    tstream.mapmake_svd(16, "map_svd.hdf5")
    assert os.path.exists(tstream.output_directory + "/map_svd.hdf5")


def test_mapmake_kl(tstream, products):
    tstream.set_kltransform("kl")
    tstream.mapmake_kl(16, "map_kl.hdf5")
    assert os.path.exists(tstream.output_directory + "/map_kl.hdf5")


def test_mapmake_kl_wiener(tstream, products):
    """Wiener-weighted KL map: S/(S+N) filtering of the KL modes
    (reference /root/reference/drift/pipeline/timestream.py:400-455)."""
    tstream.set_kltransform("kl")
    tstream.mapmake_kl(16, "map_kl_wiener.hdf5", wiener=True)
    path = tstream.output_directory + "/map_kl_wiener.hdf5"
    assert os.path.exists(path)
    with h5py.File(path, "r") as f:
        mw = f["map"][:]
    with h5py.File(tstream.output_directory + "/map_kl.hdf5", "r") as f:
        m0 = f["map"][:]
    assert np.isfinite(mw).all()
    # the Wiener weight down-weights low-S/N modes: maps differ but stay
    # at the same overall scale
    assert not np.allclose(mw, m0)
    assert np.abs(mw).max() < 10 * np.abs(m0).max() + 1e-12


def test_powerspectrum(tstream, products):
    tstream.set_kltransform("kl")
    tstream.set_psestimator("ps1")
    ps = tstream.powerspectrum()
    assert ps is not None
    assert np.isfinite(ps).all()
    with h5py.File(tstream._psfile, "r") as f:
        assert "powerspectrum" in f
        assert "fisher" in f


def test_timestream_pickle(tstream, products):
    tstream.save()
    ts2 = timestream.Timestream.load(tstream.directory)
    assert ts2.directory == tstream.directory
