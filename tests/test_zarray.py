"""Split-complex arithmetic must match native complex linear algebra."""

import numpy as np
import pytest

from driftscan_tpu.ops import zarray as za


def _crand(rng, *shape):
    return rng.standard_normal(shape) + 1j * rng.standard_normal(shape)


def test_roundtrip_and_arithmetic():
    rng = np.random.default_rng(0)
    a = _crand(rng, 4, 5)
    b = _crand(rng, 4, 5)
    az, bz = za.of(a), za.of(b)

    np.testing.assert_allclose(za.to_numpy(az), a)
    np.testing.assert_allclose(za.to_numpy(az * bz), a * b, rtol=1e-12)
    np.testing.assert_allclose(za.to_numpy(az + bz), a + b, rtol=1e-12)
    np.testing.assert_allclose(za.to_numpy(az.conj()), a.conj(), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(az.abs2()), np.abs(a) ** 2, rtol=1e-12)


def test_matmul_einsum():
    rng = np.random.default_rng(1)
    a = _crand(rng, 6, 4)
    b = _crand(rng, 4, 7)
    out = za.to_numpy(za.matmul(za.of(a), za.of(b)))
    np.testing.assert_allclose(out, a @ b, rtol=1e-12)

    c = _crand(rng, 3, 6, 4)
    d = _crand(rng, 3, 4, 2)
    out = za.to_numpy(za.einsum("bij,bjk->bik", za.of(c), za.of(d)))
    np.testing.assert_allclose(out, np.einsum("bij,bjk->bik", c, d), rtol=1e-12)


def test_eigh_matches_numpy():
    rng = np.random.default_rng(2)
    a = _crand(rng, 8, 8)
    h = a + a.conj().T

    w, v = za.eigh(za.of(h))
    w = np.asarray(w)
    vc = za.to_numpy(v)

    wn = np.linalg.eigvalsh(h)
    np.testing.assert_allclose(w, wn, rtol=1e-10, atol=1e-10)
    # Eigen-relation and orthonormality (eigenvectors defined up to phase)
    np.testing.assert_allclose(h @ vc, vc @ np.diag(w), atol=1e-9)
    np.testing.assert_allclose(vc.conj().T @ vc, np.eye(8), atol=1e-9)


def test_eigh_batched():
    rng = np.random.default_rng(3)
    a = _crand(rng, 5, 6, 6)
    h = a + np.swapaxes(a, -1, -2).conj()
    w, v = za.eigh(za.of(h))
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(w)[i], np.linalg.eigvalsh(h[i]), atol=1e-9
        )


def test_whiten_eigh_generalised():
    rng = np.random.default_rng(4)
    n = 10
    a = _crand(rng, n, n)
    S = a + a.conj().T
    b = _crand(rng, n, n)
    N = b @ b.conj().T + n * np.eye(n)

    import scipy.linalg as la

    w, v, dmin = za.whiten_eigh(za.of(S), za.of(N))
    w = np.asarray(w)
    vc = za.to_numpy(v)

    ws = la.eigh(S, N, eigvals_only=True)
    np.testing.assert_allclose(w, ws, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(S @ vc, N @ vc @ np.diag(w), atol=1e-8)
    np.testing.assert_allclose(vc.conj().T @ N @ vc, np.eye(n), atol=1e-8)
    assert float(dmin) > 0


def test_svd_eigh():
    rng = np.random.default_rng(5)
    for shape in [(9, 5), (5, 9), (6, 6)]:
        m = _crand(rng, *shape)
        u, s, vh = za.svd_eigh(za.of(m))
        s = np.asarray(s)
        un, sn, vn = np.linalg.svd(m, full_matrices=False)
        np.testing.assert_allclose(s, sn, rtol=1e-8, atol=1e-10)
        # Reconstruction
        rec = za.to_numpy(u) * s @ za.to_numpy(vh)
        np.testing.assert_allclose(rec, m, atol=1e-8)
        # Orthonormal factors
        uc = za.to_numpy(u)
        np.testing.assert_allclose(uc.conj().T @ uc, np.eye(len(s)), atol=1e-7)


def test_svd_eigh_rank_deficient():
    rng = np.random.default_rng(6)
    m = _crand(rng, 8, 3) @ _crand(rng, 3, 6)  # rank 3 in 8x6
    u, s, vh = za.svd_eigh(za.of(m))
    s = np.asarray(s)
    sn = np.linalg.svd(m, compute_uv=False)
    np.testing.assert_allclose(s[:3], sn[:3], rtol=1e-8)
    assert np.abs(s[3:]).max() < 1e-6 * s[0]
    rec = za.to_numpy(u) * s @ za.to_numpy(vh)
    np.testing.assert_allclose(rec, m, atol=1e-7)


def test_pinv():
    rng = np.random.default_rng(7)
    m = _crand(rng, 7, 4)
    p = za.to_numpy(za.pinv(za.of(m)))
    np.testing.assert_allclose(p, np.linalg.pinv(m), atol=1e-8)


def test_jit_compatible():
    import jax

    rng = np.random.default_rng(8)
    a = _crand(rng, 6, 6)
    h = a + a.conj().T

    @jax.jit
    def f(z):
        w, v = za.eigh(z)
        return w

    w = np.asarray(f(za.of(h)))
    np.testing.assert_allclose(w, np.linalg.eigvalsh(h), atol=1e-9)


def test_cholesky_complex():
    """za.cholesky via the interleaved embedding equals the complex factor."""
    import jax

    rng = np.random.default_rng(17)
    a = _crand(rng, 12, 20)
    h = a @ a.conj().T + 0.1 * np.eye(12)

    L = za.to_numpy(jax.jit(za.cholesky)(za.of(h)))
    Ln = np.linalg.cholesky(h)
    np.testing.assert_allclose(L, Ln, rtol=1e-10, atol=1e-12)
    # lower triangular with real diagonal
    assert np.allclose(np.triu(L, 1), 0.0)
    assert np.allclose(np.diag(L).imag, 0.0)
