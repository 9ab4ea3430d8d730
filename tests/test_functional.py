"""End-to-end functional test: full product generation from the YAML config
(the analogue of the reference's tests/test_functional.py, with
self-generated golden products instead of downloaded ones)."""

import os
import shutil

import h5py
import numpy as np
import pytest

from driftscan_tpu.core import manager


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    """Run the full drift-makeproducts pipeline on the test config."""
    base = tmp_path_factory.mktemp("functional")
    src = os.path.join(os.path.dirname(__file__), "testparams.yaml")

    # Rewrite the output directory to the temp location
    with open(src) as f:
        conf = f.read()
    conf = conf.replace('"testdir"', f'"{base}/testdir"')
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(conf)

    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def test_manager_types(products):
    from driftscan_tpu.core import beamtransfer, doublekl, kltransform, psmc
    from driftscan_tpu.telescope import cylinder

    assert isinstance(products.telescope, cylinder.PolarisedCylinderTelescope)
    assert isinstance(products.beamtransfer, beamtransfer.BeamTransfer)
    assert isinstance(products.kltransforms["kl"], kltransform.KLTransform)
    assert isinstance(products.kltransforms["dk"], doublekl.DoubleKL)
    assert isinstance(products.psestimators["ps1"], psmc.PSMonteCarlo)
    # Config landed on the objects
    assert products.telescope.num_cylinders == 2
    assert products.telescope.tsys_flat == 1.0
    assert products.kltransforms["kl"].use_foregrounds is False
    assert products.beamtransfer.polsvcut == 1.0


def test_directory_contract(products):
    """The on-disk product layout must match the reference contract."""
    d = products.directory
    tel = products.telescope

    assert os.path.exists(d + "/config.yaml")
    assert os.path.exists(d + "/configdump.yaml")
    assert os.path.exists(d + "/bt/telescopeobject.pickle")
    assert os.path.exists(d + "/bt/beam_m/COMPLETED")
    assert os.path.exists(d + "/bt/svdspectrum.hdf5")

    for mi in range(tel.mmax + 1):
        mdir = d + "/bt/beam_m/%02d" % mi if tel.mmax < 100 else None
        assert os.path.exists(products.beamtransfer._mfile(mi))
        assert os.path.exists(products.beamtransfer._svdfile(mi))
        assert os.path.exists(products.kltransforms["kl"]._evfile % mi)
        assert os.path.exists(products.kltransforms["dk"]._evfile % mi)

    assert os.path.exists(products.kltransforms["kl"].evdir + "/evals.hdf5")
    assert os.path.exists(products.psestimators["ps1"].psdir + "/fisher.hdf5")
    assert os.path.exists(products.psestimators["ps2"].psdir + "/fisher.hdf5")


def test_beam_m_structure(products):
    bt = products.beamtransfer
    tel = products.telescope
    mi = 1
    with h5py.File(bt._mfile(mi), "r") as f:
        dset = f["beam_m"]
        assert dset.shape == (
            tel.nfreq,
            2,
            tel.nbase,
            4,
            tel.lmax + 1 - mi,
        )
        assert f.attrs["m"] == mi
        beam = dset[:]
    assert np.isfinite(beam).all()
    assert np.abs(beam).max() > 0


def test_svd_files(products):
    bt = products.beamtransfer
    mi = 2
    sig = bt.beam_singularvalues(mi)
    assert np.isfinite(sig).all()
    assert (sig >= 0).all()
    # Full svd spectrum collected
    sv = bt.svd_all()
    assert sv.shape[0] == products.telescope.mmax + 1


def test_kl_spectra(products):
    kl = products.kltransforms["kl"]
    with h5py.File(kl.evdir + "/evals.hdf5", "r") as f:
        evals = f["evals"][:]
    assert evals.shape == (
        products.telescope.mmax + 1,
        products.beamtransfer.ndofmax,
    )
    assert np.isfinite(evals).all()
    # Zero-padded ascending per m
    assert (np.sort(evals, axis=-1) == evals).all()

    dk = products.kltransforms["dk"]
    with h5py.File(dk.evdir + "/evals.hdf5", "r") as f:
        assert "f_evals" in f
        devals = f["evals"][:]
    assert np.isfinite(devals).all()


def test_fisher(products):
    ps = products.psestimators["ps1"]
    fisher, bias = ps.fisher_bias()

    nbands = 2  # 3 band edges -> 2 bands, num_theta = 1
    assert fisher.shape == (nbands, nbands)
    assert np.isfinite(fisher).all()
    # Fisher must be symmetric and positive semi-definite
    np.testing.assert_allclose(fisher, fisher.T, rtol=1e-10)
    evs = np.linalg.eigvalsh(fisher)
    assert evs.min() > -1e-8 * max(evs.max(), 1)

    with h5py.File(ps.psdir + "/fisher.hdf5", "r") as f:
        assert f.attrs["bandtype"] == b"polar"
        for key in [
            "fisher",
            "bias",
            "covariance",
            "errors",
            "correlation",
            "band_power",
            "k_start",
            "k_end",
            "k_center",
            "theta_start",
            "theta_end",
            "theta_center",
            "k_bands",
            "theta_bands",
        ]:
            assert key in f

    # ps2 has num_theta=2 -> 4 bands
    ps2 = products.psestimators["ps2"]
    fisher2, _ = ps2.fisher_bias()
    assert fisher2.shape == (4, 4)


def test_fisher_reproducible(products):
    """With a fixed seed the MC Fisher must be deterministic."""
    ps = products.psestimators["ps1"]
    ps.genbands()
    f1, b1 = ps._work_fisher_bias_m(1)
    f2, b2 = ps._work_fisher_bias_m(1)
    np.testing.assert_allclose(f1, f2)
    np.testing.assert_allclose(b1, b2)


def test_resume_skips_existing(products, capsys):
    """Re-running generate() must skip everything (checkpoint/resume)."""
    import time

    st = time.time()
    products.generate()
    # A full skip should be fast (no SHT or eigensolve recomputation)
    assert time.time() - st < 30.0
