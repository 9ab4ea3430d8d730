"""Convention-pinning golden tests.

The reference validates against golden products from a hosted tarball
(/root/reference/tests/test_functional.py:121-127) with tolerance tiers
(beam_m rel 1e-4, SVD rel 1e-3, KL rel 1e-4).  That tarball is not
reachable here, so instead the transfer matrices are pinned against a
*fully independent* brute-force evaluation: scipy spherical harmonics
summed over healpix pixels.  This catches any drift in the Y_lm
convention (Condon-Shortley phase, orthonormal normalisation), the
conjugation chain (btrans = conj(SHT(conj(map)))), the healpix ring
geometry and the FFT-like (+m, -m) packing — exactly the conventions the
golden products pin in the reference CI.
"""

import numpy as np
import pytest

from driftscan_tpu.core import telescope as teles
from driftscan_tpu.ops import healpix, sht
from driftscan_tpu.telescope import cylinder


def _sph_harm(l, m, theta, phi):
    from scipy.special import sph_harm_y

    return sph_harm_y(l, m, theta, phi)


@pytest.fixture(scope="module")
def tel():
    t = cylinder.UnpolarisedCylinderTelescope.from_config(
        dict(
            num_freq=2,
            freq_start=100.0,
            freq_end=110.0,
            freq_mode="edge",
            num_cylinders=2,
            cylinder_width=2.0,
            num_feeds=2,
            feed_spacing=1.5,
        )
    )
    return t


def test_beam_m_against_scipy_brute_force(tel):
    """B[l, +/-m] must equal Omega_pix * sum_p bmap_p Y_{l,+/-m}(p),
    evaluated per unit at the unit's own nside bucket (the transfer
    driver gives each baseline the healpix resolution its own band limit
    requires)."""
    bl = np.arange(tel.npairs)
    fi = np.zeros_like(bl)
    tarray = np.asarray(tel.transfer_matrices(bl, fi))  # (nb, npol, L+1, 2L+1)

    lmax_arr, _ = teles.max_lm(
        tel.baselines, tel.wavelengths[0], tel.u_width, tel.v_width
    )
    unit_lmax = np.ceil(lmax_arr * tel.l_boost).astype(int)

    lside = tel.lmax
    rng = np.random.default_rng(0)

    for ui in range(tel.npairs):
        nside = tel._nside_for(int(unit_lmax[ui]))
        tel._init_trans(nside)
        # device maps live in the padded ring layout: unpad for the
        # compact-pixel brute-force quadrature below
        bmap = sht.unpad_map(
            np.asarray(tel._beam_map_batch(np.array([ui]), np.array([0])))[0],
            nside,
        )

        geom = healpix.ring_geometry(nside)
        ang = healpix.ang_positions(nside)
        theta, phi = ang[:, 0], ang[:, 1]
        omega = float(geom.pixarea)

        lm_u = int(unit_lmax[ui])
        pairs = [(0, 0), (1, 1), (2, -1), (lm_u, lm_u)]
        pairs += [
            (int(l), int(m))
            for l in rng.integers(1, lm_u, 3)
            for m in [rng.integers(-l, l + 1)]
        ]

        scale = np.abs(tarray[ui, 0]).max()
        for l, m in pairs:
            ylm = _sph_harm(l, abs(m), theta, phi)
            if m < 0:
                ylm = (-1) ** m * np.conj(ylm)
            direct = omega * (bmap * ylm).sum()

            col = m if m >= 0 else 2 * lside + 1 + m  # FFT-like packing
            np.testing.assert_allclose(
                tarray[ui, 0, l, col], direct, rtol=1e-8, atol=1e-9 * scale,
            )


def test_negative_m_packing_identity(tel):
    """The packed negative-m block of the m-ordered files must obey
    B(-m) = (-1)^m conj(B(m)) of the *negative-m transfer*, i.e. the
    reference's packing at /root/reference/drift/core/beamtransfer.py:620-624."""
    import tempfile

    from driftscan_tpu.core import beamtransfer

    with tempfile.TemporaryDirectory() as tmp:
        bt = beamtransfer.BeamTransfer(tmp + "/bt/", telescope=tel)
        bt.truncate = False
        bt.generate(skip_svd=True)

        bl = np.arange(tel.npairs)
        tarray = np.asarray(tel.transfer_matrices(bl, np.zeros_like(bl)))

        for mi in (1, tel.mmax // 2):
            bm = bt.beam_m(mi, fi=0)  # (2, nb, npol, L+1)
            np.testing.assert_allclose(
                bm[1, :, 0], (-1) ** mi * np.conj(tarray[:, 0, :, -mi]),
                atol=1e-12,
            )


def test_kl_spectrum_against_dense_f64(tel):
    """End-to-end KL spectra from the pipeline must match a dense f64
    generalised eigensolve of the same covariances (reference tier:
    KL rel 1e-4)."""
    import tempfile

    import scipy.linalg as sla

    from driftscan_tpu.core import beamtransfer, kltransform

    with tempfile.TemporaryDirectory() as tmp:
        bt = beamtransfer.BeamTransfer(tmp + "/bt/", telescope=tel)
        bt.generate()
        kl = kltransform.KLTransform(bt, subdir="kl")
        kl.subset = False
        kl.generate()

        compared = 0
        for mi in range(tel.mmax + 1):
            with __import__("h5py").File(kl._evfile % mi, "r") as f:
                evals = f["evals"][:]
            if evals.size == 0:
                continue

            cs, cn = kl.sn_covariance(mi)
            n = bt.ndof(mi)
            w_ref = sla.eigh(
                cs.reshape(n, n), cn.reshape(n, n), eigvals_only=True
            )
            # compare the significant top of the spectrum only: the deep
            # tail is below both solvers' resolution
            sel = w_ref > 1e-3 * w_ref.max()
            k = int(sel.sum())
            if k == 0 or w_ref.max() <= 0:
                continue
            np.testing.assert_allclose(evals[-k:], w_ref[sel], rtol=1e-4)
            compared += 1
        assert compared > 0, "no m had a significant KL spectrum to compare"
