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

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow


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


def test_disk_streamed_fisher_matches_memory(products):
    """The chunked disk-streamed Fisher path == the in-memory device path.

    Forces the disk cache on (tiny ndof threshold) and a chunk budget so
    small that several chunk blocks are exercised, including the
    off-diagonal Hermitian fill.
    """
    ps = products.psestimators["psx"]
    ps.genbands()
    mi = 1
    f_mem, _ = ps._work_fisher_bias_m(mi)

    old_ndof, old_bytes = ps._disk_cache_ndof, ps._fisher_chunk_bytes
    ps._disk_cache_ndof = 1  # force disk path
    ps._fisher_chunk_bytes = 1  # force chunk size 1 -> nbands chunks
    try:
        assert ps._use_disk(mi)
        f_disk, _ = ps._work_fisher_bias_m(mi)
    finally:
        ps._disk_cache_ndof, ps._fisher_chunk_bytes = old_ndof, old_bytes

    scale = np.abs(f_mem).max()
    np.testing.assert_allclose(f_disk, f_mem, rtol=1e-5, atol=1e-7 * scale)


def test_fisher_first_principles(products):
    """PSExact Fisher for one m == an independent f64 host computation.

    Re-derives the whole Fisher chain with the *reference's* loop
    formulas (/root/reference/drift/core/psestimation.py:701-815): per
    (f, g) frequency-pair sandwich of the band C_l through the SVD
    beams, dense KL projection, then the explicit weighted double-loop
    pair trace — no driftscan_tpu projection kernels involved.
    """
    ps = products.psestimators["psx"]
    kl = ps.kltrans
    bt = kl.beamtransfer
    ps.genbands()
    mi = 1

    f_pipeline, _ = ps._work_fisher_bias_m(mi)

    evals, evecs = kl.modes_m(mi, threshold=ps.threshold)
    assert evals is not None
    w = 1.0 / (evals + 1.0)
    nkl = evals.size
    nbands = ps.nbands

    beam = bt.beam_svd(mi).astype(np.complex128)  # (F, S, P, L)
    idx, _, _ = bt._compact_indices(mi)
    F, S = bt.nfreq, bt.svd_len

    projs = []
    for bi in range(nbands):
        cl = ps.clarray[bi]  # (L, F, F) real
        # sandwich per frequency pair (temperature only)
        svdmat = np.zeros((F, S, F, S), dtype=np.complex128)
        for fi in range(F):
            for gi in range(F):
                # sum_l B[fi,a,l] cl[l,fi,gi] conj(B[gi,b,l])
                bf = beam[fi, :, 0, :]  # (S, L)
                bg = beam[gi, :, 0, :]
                svdmat[fi, :, gi, :] = (bf * cl[:, fi, gi][None, :]) @ bg.conj().T
        compact = svdmat.reshape(F * S, F * S)[np.ix_(idx, idx)]
        projs.append(evecs @ compact @ evecs.conj().T)

    f_ref = np.zeros((nbands, nbands), dtype=np.complex128)
    for ia in range(nbands):
        for ib in range(nbands):
            acc = 0.0 + 0.0j
            for i in range(nkl):
                for j in range(nkl):
                    acc += projs[ia][i, j] * projs[ib][j, i] * w[i] * w[j]
            f_ref[ia, ib] = acc

    scale = max(np.abs(f_ref).max(), 1e-30)
    np.testing.assert_allclose(f_pipeline, f_ref, rtol=1e-6, atol=1e-9 * scale)
