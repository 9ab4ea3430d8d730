"""KLTransform with engine: topband must reproduce the exact engine's
retained products through the real file-writing pipeline."""

import glob
import os

import h5py
import numpy as np
import pytest

from driftscan_tpu.core import manager

CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           No
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
    tsys:               40.0

kltransform:
    # this tiny telescope's S/N spectrum tops out far below the default
    # 0.1 cut — drop the retention threshold so modes are actually kept
    -   type:           KLTransform
        name:           kl_exact
        threshold:      1.0e-10

    -   type:           KLTransform
        name:           kl_topband
        engine:         topband
        threshold:      1.0e-10

    -   type:           DoubleKL
        name:           dkl_exact
        foreground_threshold: 1.0e-10
        threshold:      1.0e-12

    -   type:           DoubleKL
        name:           dkl_topband
        engine:         topband
        foreground_threshold: 1.0e-10
        threshold:      1.0e-12
"""


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("kl_topband")
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(CONFIG.format(outdir=f"{base}/testdir"))
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def test_engines_differ(products):
    kle = products.kltransforms["kl_exact"]
    klt = products.kltransforms["kl_topband"]
    assert kle.engine == "exact" and klt.engine == "topband"


def test_retained_products_match(products):
    """Per m: identical retained mode counts, eigenvalues to the KL
    tier, and the same retained KL subspace (principal angles)."""
    kle = products.kltransforms["kl_exact"]
    klt = products.kltransforms["kl_topband"]
    files = sorted(glob.glob(kle.evdir + "/ev_m_*.hdf5"))
    assert files
    compared = 0
    for fe in files:
        ft = klt.evdir + "/" + os.path.basename(fe)
        with h5py.File(fe, "r") as a, h5py.File(ft, "r") as b:
            assert a.attrs["num_modes"] == b.attrs["num_modes"]
            we, wt = a["evals"][:], b["evals"][:]
            ve, vt = a["evecs"][:], b["evecs"][:]
        if we.size == 0:
            continue
        compared += 1
        np.testing.assert_allclose(wt, we, rtol=1e-3)
        # per-mode direction agreement (KL evecs are N-orthonormal, so
        # compare unit-normalised rows; skip eigenvalue clusters where
        # any within-cluster rotation is legitimate)
        for i in range(len(we)):
            gap_lo = we[i] / we[i - 1] - 1.0 if i > 0 else np.inf
            gap_hi = we[i + 1] / we[i] - 1.0 if i + 1 < len(we) else np.inf
            if min(gap_lo, gap_hi) < 1e-2:
                continue
            a = ve[i] / np.linalg.norm(ve[i])
            b = vt[i] / np.linalg.norm(vt[i])
            assert abs(np.vdot(a, b)) > 1.0 - 1e-3
    assert compared > 0  # the case must actually retain modes somewhere


def test_evals_full_tail_is_zero(products):
    """The documented topband contract: sub-threshold evals_full = 0."""
    klt = products.kltransforms["kl_topband"]
    checked = 0
    for ft in sorted(glob.glob(klt.evdir + "/ev_m_*.hdf5")):
        with h5py.File(ft, "r") as b:
            full = b["evals_full"][:]
            nret = int(b.attrs["num_modes"])
        if full.size and full.size > nret:
            assert np.all(full[: full.size - nret] == 0.0)
            checked += 1
    assert checked > 0


def test_doublekl_writer_topband_matches_exact(products):
    """DoubleKL engine: topband reproduces the exact batched writer's
    retained evals and kept stage-1 band through the file pipeline."""
    de = products.kltransforms["dkl_exact"]
    dt = products.kltransforms["dkl_topband"]
    files = sorted(glob.glob(de.evdir + "/ev_m_*.hdf5"))
    assert files
    compared = 0
    for fe in files:
        ft = dt.evdir + "/" + os.path.basename(fe)
        with h5py.File(fe, "r") as a, h5py.File(ft, "r") as b:
            assert a.attrs["num_modes"] == b.attrs["num_modes"]
            we, wt = a["evals"][:], b["evals"][:]
            fe_, ft_ = a["f_evals"][:], b["f_evals"][:]
        if we.size == 0:
            continue
        compared += 1
        np.testing.assert_allclose(wt, we, rtol=2e-3)
        ke = fe_[fe_ > 1e-10]
        kt = ft_[ft_ > 1e-10]
        assert len(ke) == len(kt)
        np.testing.assert_allclose(np.sort(kt), np.sort(ke), rtol=2e-3)
    assert compared > 0
