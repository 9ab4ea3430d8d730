"""Batched (factored two-stage QR) DoubleKL must match the per-m path.

The per-m path builds dense covariances in f64 and solves with the
whitened eigh (the reference's algorithm); the batched path never forms
them (factor-side QR, ops.fpencil.doublekl_solve_qr).  Both must agree
on the stage-1 spectrum, the kept-mode count, the stage-2 spectrum, and
the KL subspace.
"""

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
    -   type:           DoubleKL
        name:           dk_batched
        foreground_threshold: 1.0e-10

    -   type:           DoubleKL
        name:           dk_perm
        foreground_threshold: 1.0e-10
        mbatch:         1
"""


@pytest.fixture(scope="module")
def products(tmp_path_factory):
    base = tmp_path_factory.mktemp("dkl_batched")
    cfile = str(base / "params.yaml")
    with open(cfile, "w") as f:
        f.write(CONFIG.format(outdir=f"{base}/testdir"))
    m = manager.ProductManager.from_config(cfile)
    m.generate()
    return m


def test_paths_differ(products):
    """The two configs must actually exercise different code paths."""
    from driftscan_tpu.core import doublekl, kltransform

    b = products.kltransforms["dk_batched"]
    p = products.kltransforms["dk_perm"]
    assert b.mbatch > 1 and p.mbatch == 1
    assert (
        type(b)._transform_save_mbatch
        is not kltransform.KLTransform._transform_save_mbatch
    )


def test_stage1_spectra_match(products):
    b = products.kltransforms["dk_batched"]
    p = products.kltransforms["dk_perm"]
    import h5py

    for mi in range(products.telescope.mmax + 1):
        with h5py.File(b._evfile % mi, "r") as f:
            fb = f["f_evals"][:]
        with h5py.File(p._evfile % mi, "r") as f:
            fp_ = f["f_evals"][:]
        assert fb.shape == fp_.shape
        # the two paths regularise the (foreground-only) stage-1 noise
        # differently (suppressed-thermal floor vs dense 1e-14 relative
        # regulariser), so compare the dominant modes loosely
        big = np.abs(fp_) > 1e-1 * max(np.abs(fp_).max(), 1e-30)
        np.testing.assert_allclose(fb[big], fp_[big], rtol=8e-2)


def test_stage2_spectra_and_counts_match(products):
    b = products.kltransforms["dk_batched"]
    p = products.kltransforms["dk_perm"]

    for mi in range(products.telescope.mmax + 1):
        eb, vb = b.modes_m(mi)
        ep, vp = p.modes_m(mi)
        if ep is None:
            assert eb is None or eb.size == 0
            continue
        assert eb.size == ep.size, f"m={mi}: kept counts differ"
        np.testing.assert_allclose(eb, ep, rtol=5e-3)

        # same KL subspace: projector overlap (modes are N-orthonormal in
        # different but equivalent bases, so compare row spaces)
        qb = np.linalg.qr(np.asarray(vb).T)[0]
        qp = np.linalg.qr(np.asarray(vp).T)[0]
        overlap = np.linalg.svd(qb.conj().T @ qp, compute_uv=False)
        assert overlap.min() > 0.99, f"m={mi}: subspaces diverge"
