"""Integration tests of BeamTransfer generation, SVD compression and the
projection suite, on a tiny low-frequency cylinder so lmax stays small."""

import numpy as np
import pytest

from driftscan_tpu.core import beamtransfer, kltransform, doublekl
from driftscan_tpu.telescope import cylinder


UNPOL_PARAMS = dict(
    num_freq=2,
    freq_start=100.0,
    freq_end=110.0,
    freq_mode="edge",
    num_cylinders=2,
    cylinder_width=2.0,
    num_feeds=2,
    feed_spacing=1.5,
    tsys=50.0,
)

POL_PARAMS = dict(UNPOL_PARAMS, num_cylinders=1)


@pytest.fixture(scope="module")
def bt_unpol(tmp_path_factory):
    tel = cylinder.UnpolarisedCylinderTelescope.from_config(UNPOL_PARAMS)
    d = tmp_path_factory.mktemp("btdir_unpol")
    bt = beamtransfer.BeamTransfer(str(d), telescope=tel)
    bt.generate()
    return bt


@pytest.fixture(scope="module")
def bt_pol(tmp_path_factory):
    tel = cylinder.PolarisedCylinderTelescope.from_config(POL_PARAMS)
    d = tmp_path_factory.mktemp("btdir_pol")
    bt = beamtransfer.BeamTransfer(str(d), telescope=tel)
    bt.generate()
    return bt


def test_file_tree(bt_unpol):
    import os

    tel = bt_unpol.telescope
    assert os.path.exists(bt_unpol.directory + "/beam_m/COMPLETED")
    assert os.path.exists(bt_unpol._picklefile)
    assert os.path.exists(bt_unpol.directory + "/svdspectrum.hdf5")
    for mi in range(tel.mmax + 1):
        assert os.path.exists(bt_unpol._mfile(mi))
        assert os.path.exists(bt_unpol._svdfile(mi))


def test_beam_m_matches_transfer(bt_unpol):
    """The m-ordered storage must round-trip the transfer matrices,
    including the (-1)^m conjugate negative-m block.  Stored values are
    mantissa-truncated (rel 1e-7 / maxl 1e-8, on by default), so the
    comparison carries the truncation tolerance."""
    tel = bt_unpol.telescope
    bl = np.arange(tel.npairs)
    tarray = tel.transfer_matrices(bl, np.zeros_like(bl))

    for mi in [0, 1, tel.mmax]:
        bm = bt_unpol.beam_m(mi, fi=0)  # (2, nbase, npol, lmax+1)
        scale = np.abs(tarray[:, 0, :, mi]).max() + 1e-30
        np.testing.assert_allclose(
            bm[0, :, 0, :], tarray[:, 0, :, mi], rtol=3e-7, atol=3e-7 * scale
        )
        if mi > 0:
            np.testing.assert_allclose(
                bm[1, :, 0, :],
                (-1) ** mi * tarray[:, 0, :, -mi].conj(),
                rtol=3e-7,
                atol=3e-7 * scale,
            )


def test_telescope_reload(bt_unpol):
    bt2 = beamtransfer.BeamTransfer(bt_unpol.directory)
    assert bt2.telescope.num_feeds == bt_unpol.telescope.num_feeds
    np.testing.assert_allclose(
        bt2.telescope.baselines, bt_unpol.telescope.baselines
    )


def test_svd_consistency(bt_unpol):
    """beam_svd must equal beam_ut @ beam_m (the un-weighted chain)."""
    tel = bt_unpol.telescope
    mi = 1
    bm = bt_unpol.beam_m(mi).reshape(bt_unpol.nfreq, bt_unpol.ntel, bt_unpol.nsky)
    ut = bt_unpol.beam_ut(mi)
    bsvd = bt_unpol.beam_svd(mi).reshape(
        bt_unpol.nfreq, bt_unpol.svd_len, bt_unpol.nsky
    )
    for fi in range(bt_unpol.nfreq):
        np.testing.assert_allclose(bsvd[fi], ut[fi] @ bm[fi], atol=1e-8)


def test_svd_spectrum_ordering(bt_unpol):
    sv = bt_unpol.svd_all()
    assert sv.shape == (
        bt_unpol.telescope.mmax + 1,
        bt_unpol.nfreq,
        bt_unpol.svd_len,
    )
    # descending within each (m, f)
    d = np.diff(sv, axis=-1)
    assert (d <= 1e-10).all()
    assert sv.max() > 0


def test_project_vector_roundtrip_svd(bt_unpol):
    """telescope -> svd -> telescope is a projection (idempotent on the
    retained subspace)."""
    rng = np.random.default_rng(0)
    mi = 1
    v = rng.standard_normal((bt_unpol.nfreq, bt_unpol.ntel)) + 1j * rng.standard_normal(
        (bt_unpol.nfreq, bt_unpol.ntel)
    )
    s = bt_unpol.project_vector_telescope_to_svd(mi, v)
    assert s.shape[0] == bt_unpol.ndof(mi)
    v2 = bt_unpol.project_vector_svd_to_telescope(mi, s)
    s2 = bt_unpol.project_vector_telescope_to_svd(mi, v2.reshape(bt_unpol.nfreq, -1))
    np.testing.assert_allclose(s2, s, rtol=1e-6, atol=1e-10)


def test_project_matrix_sky_to_svd_vs_direct(bt_unpol):
    """Compare the einsum projection against a direct loop implementation
    (the reference algorithm, /root/reference/drift/core/beamtransfer.py:
    1135-1188)."""
    tel = bt_unpol.telescope
    mi = 1
    lside = tel.lmax + 1
    nfreq = bt_unpol.nfreq

    rng = np.random.default_rng(1)
    cl = rng.standard_normal((1, 1, lside, nfreq, nfreq))
    cl = cl + cl.transpose(0, 1, 2, 4, 3)  # symmetric in freq

    matf = bt_unpol.project_matrix_sky_to_svd(mi, cl)

    # Direct loop
    beam = bt_unpol.beam_svd(mi)
    svnum, svbounds = bt_unpol._svd_num(mi)
    expect = np.zeros((svbounds[-1], svbounds[-1]), dtype=np.complex128)
    for fi in range(nfreq):
        for fj in range(nfreq):
            fib = beam[fi, : svnum[fi], 0, :]
            fjb = beam[fj, : svnum[fj], 0, :]
            expect[
                svbounds[fi] : svbounds[fi + 1], svbounds[fj] : svbounds[fj + 1]
            ] += np.dot(fib * cl[0, 0, :, fi, fj], fjb.T.conj())

    np.testing.assert_allclose(matf, expect, rtol=1e-8, atol=1e-10)


def test_project_matrix_diag_tel_to_svd(bt_unpol):
    mi = 1
    rng = np.random.default_rng(2)
    dmat = np.abs(rng.standard_normal((bt_unpol.nfreq, bt_unpol.ntel))) + 0.1
    matf = bt_unpol.project_matrix_diagonal_telescope_to_svd(mi, dmat)

    beam = bt_unpol.beam_ut(mi)
    svnum, svbounds = bt_unpol._svd_num(mi)
    expect = np.zeros((svbounds[-1], svbounds[-1]), dtype=np.complex128)
    for fi in range(bt_unpol.nfreq):
        fb = beam[fi, : svnum[fi], :]
        expect[svbounds[fi] : svbounds[fi + 1], svbounds[fi] : svbounds[fi + 1]] = (
            fb * dmat[fi]
        ) @ fb.T.conj()
    np.testing.assert_allclose(matf, expect, rtol=1e-8, atol=1e-12)


def test_sky_to_svd_chain(bt_unpol):
    """sky->svd must equal sky->telescope followed by telescope->svd."""
    tel = bt_unpol.telescope
    mi = 1
    rng = np.random.default_rng(3)
    vec = rng.standard_normal(
        (bt_unpol.nfreq, tel.num_pol_sky, tel.lmax + 1)
    ) + 1j * rng.standard_normal((bt_unpol.nfreq, tel.num_pol_sky, tel.lmax + 1))
    # Zero the l < m entries which the BTM cannot see
    vec[..., :mi] = 0.0

    s1 = bt_unpol.project_vector_sky_to_svd(mi, vec)
    tvec = bt_unpol.project_vector_sky_to_telescope(mi, vec)
    s2 = bt_unpol.project_vector_telescope_to_svd(
        mi, tvec.reshape(bt_unpol.nfreq, bt_unpol.ntel)
    )
    np.testing.assert_allclose(s1, s2, rtol=1e-7, atol=1e-10)


def test_invbeam_backward(bt_unpol):
    """telescope_to_sky(sky_to_telescope(x)) recovers the visible modes."""
    tel = bt_unpol.telescope
    mi = 1
    rng = np.random.default_rng(4)
    vec = rng.standard_normal(
        (bt_unpol.nfreq, 1, tel.lmax + 1)
    ) + 1j * rng.standard_normal((bt_unpol.nfreq, 1, tel.lmax + 1))
    vec[..., :mi] = 0.0

    tvec = bt_unpol.project_vector_sky_to_telescope(mi, vec)
    back = bt_unpol.project_vector_telescope_to_sky(mi, tvec)
    fwd2 = bt_unpol.project_vector_sky_to_telescope(mi, back)
    np.testing.assert_allclose(fwd2, tvec, rtol=1e-5, atol=1e-8)


def test_polarised_triple_svd(bt_pol):
    """Polarised SVD output: shapes, mode counts, spectrum files."""
    tel = bt_pol.telescope
    assert tel.num_pol_sky == 4
    mi = 1
    ut = bt_pol.beam_ut(mi)
    assert ut.shape == (bt_pol.nfreq, bt_pol.svd_len, bt_pol.ntel)
    sig = bt_pol.beam_singularvalues(mi)
    assert (np.diff(sig, axis=-1) <= 1e-10).all()

    # beam_svd = ut @ beam_m consistency holds in the polarised case too
    bm = bt_pol.beam_m(mi).reshape(bt_pol.nfreq, bt_pol.ntel, bt_pol.nsky)
    bsvd = bt_pol.beam_svd(mi).reshape(bt_pol.nfreq, bt_pol.svd_len, bt_pol.nsky)
    for fi in range(bt_pol.nfreq):
        np.testing.assert_allclose(bsvd[fi], ut[fi] @ bm[fi], atol=1e-8)


def test_kltransform(bt_unpol):
    kl = kltransform.KLTransform.from_config(
        {"subset": False, "inverse": True}, bt_unpol, subdir="kltest"
    )
    kl.generate()

    import os

    assert os.path.exists(kl.evdir + "/evals.hdf5")

    mi = 1
    evals, evecs = kl.modes_m(mi)
    nside = bt_unpol.ndof(mi)
    assert evals.size == nside
    assert np.all(np.diff(evals) >= 0)  # ascending

    # Verify the simultaneous diagonalisation: evecs S evecs^H = diag(evals),
    # evecs N evecs^H = I.
    S, N = kl.sn_covariance(mi)
    np.testing.assert_allclose(
        evecs @ N @ evecs.conj().T, np.eye(nside), atol=1e-7
    )
    np.testing.assert_allclose(
        evecs @ S @ evecs.conj().T, np.diag(evals), atol=np.abs(evals).max() * 1e-6
    )

    # KL projection roundtrip via the cached inverse
    rng = np.random.default_rng(5)
    v = rng.standard_normal(nside) + 1j * rng.standard_normal(nside)
    k = kl.project_vector_svd_to_kl(mi, v)
    v2 = kl.project_vector_kl_to_svd(mi, k)
    np.testing.assert_allclose(v2, v, rtol=1e-6, atol=1e-8)


def test_doublekl(bt_unpol):
    dk = doublekl.DoubleKL.from_config({"subset": True}, bt_unpol, subdir="dktest")
    dk.generate()

    mi = 1
    with __import__("h5py").File(dk._evfile % mi, "r") as f:
        assert "f_evals" in f
        assert "evals_full" in f
        evals = f["evals"][:]

    # Surviving modes exceed the S/N threshold implicitly (subset cut)
    if evals.size:
        assert np.all(evals >= dk.threshold - 1e-10)
