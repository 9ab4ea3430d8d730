"""Top-band pencil engine (fpencil.gram_topband / kl_solve_qr_topband).

Validates the Chebyshev-filtered subspace iteration against the dense
complex128 generalised-eigh reference at production-like conditioning,
and the completeness certificate against its two failure modes (basis
overflow, too few levels for the spectrum's range).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from driftscan_tpu.ops import fpencil
from driftscan_tpu.ops import zarray as za

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow


CUT = 0.1


def _pencil(seed, n, Ks, Kf, sig_top, fg_top):
    """Synthetic factored pencil with controlled conditioning."""
    rng = np.random.default_rng(seed)
    As = rng.standard_normal((n, Ks)) + 1j * rng.standard_normal((n, Ks))
    As *= np.logspace(sig_top, sig_top - 7, Ks)[None, :]
    Af = rng.standard_normal((n, Kf)) + 1j * rng.standard_normal((n, Kf))
    Af *= np.logspace(fg_top, 0, Kf)[None, :]
    az = za.Z(jnp.asarray(As.real, jnp.float32), jnp.asarray(As.imag, jnp.float32))
    fz = za.Z(jnp.asarray(Af.real, jnp.float32), jnp.asarray(Af.imag, jnp.float32))
    ev_ref, _ = fpencil.kl_solve_dense_ref(
        As.astype(np.complex128), Af.astype(np.complex128), with_thermal=True
    )
    return az, fz, np.sort(ev_ref)[::-1]


class TestTopband:
    def test_matches_dense_reference(self):
        """Retained evals match the dense f64 pencil to the 1e-4 tier."""
        az, fz, e = _pencil(11, 128, 90, 50, sig_top=2.5, fg_top=5)
        nret = int((e > CUT).sum())
        assert nret > 10  # the case must actually exercise the band

        res, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=32)
        assert bool(ok)
        got = np.asarray(res.evals, np.float64)[::-1]
        got = got[got > 0]
        assert len(got) == nret
        rel = np.abs(got - e[:nret]) / e[:nret]
        assert rel.max() < 1e-4

    def test_wide_conditioning(self):
        """lambda_max ~ 1e8 above the cut still meets the tier."""
        az, fz, e = _pencil(13, 128, 90, 50, sig_top=3.5, fg_top=5)
        nret = int((e > CUT).sum())
        # lambda_max ~ 1.5e9: 10.2 decades above the cut needs 6
        # two-decade levels (5 leave the last band at 0.15 > cut, which
        # the certificate correctly flags)
        res, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=48, levels=6)
        assert bool(ok)
        got = np.asarray(res.evals, np.float64)[::-1]
        got = got[got > 0]
        assert len(got) == nret
        rel = np.abs(got - e[:nret]) / e[:nret]
        assert rel.max() < 2e-4

    def test_certificate_basis_overflow(self):
        """Total capacity levels*k below the retained count -> ok False.

        (A single level's band overflowing is self-healing — leftovers
        surface at the next level's band top — so the certificate's
        contract is on *total* completeness, not per-level width.)
        """
        az, fz, e = _pencil(11, 128, 90, 50, sig_top=2.5, fg_top=5)
        nret = int((e > CUT).sum())
        k_small = max(nret // 10, 1)  # capacity levels*k < nret
        _, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=k_small)
        assert not bool(ok)

    def test_certificate_too_few_levels(self):
        """Spectrum range beyond levels*2 decades -> ok must be False."""
        az, fz, e = _pencil(13, 128, 90, 50, sig_top=3.5, fg_top=5)
        _, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=48, levels=2)
        assert not bool(ok)

    def test_empty_band(self):
        """Nothing above the cut: zero capture with a True certificate."""
        az, fz, _ = _pencil(9, 96, 50, 30, sig_top=-4, fg_top=5)
        res, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=16)
        assert bool(ok)
        assert float(jnp.max(res.evals)) == 0.0

    def test_vmapped_batch(self):
        """vmap over a pencil batch gives the same results as per-m."""
        cases = [_pencil(s, 96, 60, 40, 2.0, 4) for s in (21, 22, 23)]
        ar = jnp.stack([c[0].re for c in cases])
        ai = jnp.stack([c[0].im for c in cases])
        fr = jnp.stack([c[1].re for c in cases])
        fi = jnp.stack([c[1].im for c in cases])

        def solve(a_re, a_im, f_re, f_im):
            res, ok = fpencil.kl_solve_qr_topband(
                za.Z(a_re, a_im), za.Z(f_re, f_im), cut=CUT, k=24
            )
            return res.evals, ok

        evb, okb = jax.vmap(solve)(ar, ai, fr, fi)
        for i, (azi, fzi, e) in enumerate(cases):
            res, ok = fpencil.kl_solve_qr_topband(azi, fzi, cut=CUT, k=24)
            assert bool(okb[i]) == bool(ok)
            np.testing.assert_allclose(
                np.asarray(evb[i]), np.asarray(res.evals), rtol=1e-4, atol=1e-6
            )
            got = np.asarray(evb[i], np.float64)[::-1]
            got = got[got > 0]
            nret = int((e > CUT).sum())
            if bool(okb[i]):
                assert len(got) == nret

    def test_eigenvectors_rayleigh(self):
        """Retained eigenvectors verify by f64 Rayleigh quotient of the
        original pencil, at parity with the exact production path.

        The bound here is the *whitening's* backward error, shared by
        both engines: v = R^-1 u picks up eps32 * ||N|| from the f32
        CholeskyQR factor, a ~1% Rayleigh deviation at this
        conditioning.  Measured on this case the exact kl_solve_qr path
        gives median 1.3% with a 296x outlier at the cut; the topband
        path must not be worse than its median profile.
        """
        az, fz, e = _pencil(11, 128, 90, 50, sig_top=2.5, fg_top=5)
        nret = int((e > CUT).sum())
        res, ok = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=32)
        assert bool(ok)
        As = np.asarray(az.re, np.float64) + 1j * np.asarray(az.im, np.float64)
        Af = np.asarray(fz.re, np.float64) + 1j * np.asarray(fz.im, np.float64)
        S = As @ As.conj().T
        N = np.eye(As.shape[0]) + Af @ Af.conj().T
        V = np.asarray(res.evecs.re, np.float64) + 1j * np.asarray(
            res.evecs.im, np.float64
        )
        w = np.asarray(res.evals, np.float64)
        errs = []
        for j in range(len(w) - nret, len(w)):
            v = V[:, j]
            rq = (v.conj() @ S @ v).real / (v.conj() @ N @ v).real
            errs.append(abs(rq - w[j]) / w[j])
        errs = np.array(errs)
        assert np.median(errs) < 2e-2
        assert errs.max() < 5e-2


def test_cholqr_split_impl_matches_interleaved():
    """The split-complex CholeskyQR (DRIFTSCAN_TPU_QR_IMPL=cholqr_split)
    computes the same whitening factor as the interleaved-embedding
    default (they are the same algorithm through the interleave ring
    homomorphism), and the pencil solved through it stays at the same
    distance from the dense f64 reference."""
    az, fz, e = _pencil(11, 128, 90, 50, sig_top=2.5, fg_top=5)
    rows = fpencil._thermal_noise_rows(fz, jnp.asarray(1.0, jnp.float32))
    r_a = np.asarray(fpencil.chol_qr_r(za.interleave(rows)), np.float64)
    r_b = np.asarray(fpencil._chol_qr_r_split(rows), np.float64)
    assert np.abs(r_a - r_b).max() < 1e-5 * np.abs(r_a).max()

    nret = int((e > CUT).sum())
    kl_a = fpencil.kl_solve_qr(az, fz, with_thermal=True)
    old = fpencil._QR_IMPL
    try:
        fpencil._QR_IMPL = "cholqr_split"
        kl_b = fpencil.kl_solve_qr(az, fz, with_thermal=True)
    finally:
        fpencil._QR_IMPL = old
    ea = np.sort(np.asarray(kl_a.evals, np.float64))[::-1][:nret]
    eb = np.sort(np.asarray(kl_b.evals, np.float64))[::-1][:nret]
    ref_a = (np.abs(ea - e[:nret]) / e[:nret]).max()
    ref_b = (np.abs(eb - e[:nret]) / e[:nret]).max()
    assert ref_b < max(2.0 * ref_a, 1e-4)


def test_doublekl_topband_matches_dense_two_stage():
    """Both DoubleKL stages through the top-band engine agree with an
    independent dense f64 two-stage solve — counts exactly, values to
    well inside the reference's DoubleKL tier (1e-2).

    (At this conditioning the dense referee is the only valid anchor:
    the exact f32 engine itself produces spurious above-cut modes when
    lambda_max approaches the eps32^2 deflation envelope.)
    """
    import scipy.linalg as sla

    az, fz, _ = _pencil(11, 128, 90, 50, sig_top=5.0, fg_top=3)
    As = np.asarray(az.re, np.float64) + 1j * np.asarray(az.im, np.float64)
    Af = np.asarray(fz.re, np.float64) + 1j * np.asarray(fz.im, np.float64)
    n = As.shape[0]
    S = As @ As.conj().T
    F = Af @ Af.conj().T
    # mirror the engine's stage-1 regularisation exactly — including its
    # power-iteration lambda_max estimate: the kept (low-foreground)
    # modes are nc1-dominated, so a ~0.2% lambda_max estimation
    # difference shifts every kept eigenvalue by the same relative
    # amount (a property shared with the exact engine, not a top-band
    # artefact)
    lam_f = float(fpencil._spectral_norm_sq(fz))
    nc1 = 1e-6 * lam_f + 1e-14 * np.abs(F).max()
    w1, q1 = sla.eigh(
        0.5 * (S + S.conj().T), 0.5 * (F + F.conj().T) + nc1 * np.eye(n)
    )
    P = q1[:, w1 > 100.0]
    assert P.shape[1] > 10
    S2 = P.conj().T @ S @ P
    N2 = P.conj().T @ (np.eye(n) + F) @ P
    w2 = np.sort(
        sla.eigh(0.5 * (S2 + S2.conj().T), 0.5 * (N2 + N2.conj().T),
                 eigvals_only=True)
    )[::-1]
    w1k = np.sort(w1[w1 > 100.0])[::-1]

    f1, e1, v1, nk, ok = fpencil.doublekl_solve_qr_topband(
        az, fz, cut=CUT, k=48, levels=7
    )
    assert bool(ok)
    f1n = np.asarray(f1, np.float64)
    f1n = np.sort(f1n[f1n > 100.0])[::-1]
    e1n = np.asarray(e1, np.float64)
    e1n = np.sort(e1n[e1n > CUT])[::-1]
    w2r = w2[w2 > CUT]

    assert len(f1n) == len(w1k) == int(nk)
    np.testing.assert_allclose(f1n, w1k, rtol=1e-3)
    assert len(e1n) == len(w2r)
    np.testing.assert_allclose(e1n, w2r, rtol=1e-3)


def test_interleave_stack_impl_matches_gather():
    """DRIFTSCAN_TPU_INTERLEAVE=stack assembles the identical embedding."""
    rng = np.random.default_rng(0)
    for shape in ((5, 7), (3, 8, 6), (2, 1, 4, 3)):
        a = rng.standard_normal(shape)
        b = rng.standard_normal(shape)
        z = za.Z(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
        g = np.asarray(za.interleave(z))
        old = za._INTERLEAVE_IMPL
        try:
            za._INTERLEAVE_IMPL = "stack"
            s = np.asarray(za.interleave(z))
        finally:
            za._INTERLEAVE_IMPL = old
        np.testing.assert_array_equal(g, s)


def test_filter_precision_flag_preserves_solution():
    """The filter-stage precision override must plumb through cleanly.

    On the CPU backend matmul precision is a no-op, so the solutions
    must be bitwise-stable under the flag — this guards the plumbing
    (kwarg routing, trace-time module-state read), not the numerics,
    which only the on-chip A/B can measure (doc/design.md 5b8).
    """
    az, fz, e = _pencil(23, 96, 64, 40, sig_top=2.0, fg_top=4)
    nret = int((e > CUT).sum())

    res0, ok0 = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=32)
    old = fpencil._FILTER_PRECISION
    fpencil._FILTER_PRECISION = "high"
    try:
        res1, ok1 = fpencil.kl_solve_qr_topband(az, fz, cut=CUT, k=32)
    finally:
        fpencil._FILTER_PRECISION = old
    assert bool(ok0) and bool(ok1)
    e0 = np.asarray(res0.evals, np.float64)
    e1 = np.asarray(res1.evals, np.float64)
    assert int((e0 > 0).sum()) == nret
    np.testing.assert_allclose(e1, e0, rtol=1e-12, atol=0)


def test_block_norm_estimator_sees_through_shelf():
    """A dense shelf just below an above-cut outlier dilutes the
    single-vector power estimate below the cut (the false-certify
    scenario); the block Rayleigh-Ritz estimator the certificate uses
    must resolve the outlier."""
    import jax.numpy as jnp

    from driftscan_tpu.ops import zarray as za

    rng = np.random.default_rng(7)
    n = 512
    lam = np.full(n, 1e-6)
    lam[0] = 1.05  # the outlier the certificate must not miss
    lam[1:501] = 0.90  # the diluting shelf
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    y = za.Z(jnp.asarray(q * np.sqrt(lam)[None, :]), jnp.zeros((n, n)))

    single = float(fpencil._spectral_norm_sq(y, iters=12))
    block = float(fpencil._spectral_norm_sq_block(y, q=16, iters=32))
    cut = 1.0
    assert single < cut  # documents the failure mode being guarded
    assert block > cut
    np.testing.assert_allclose(block, 1.05, rtol=1e-2)
