"""Validation of the healpix geometry and the SHT engine against analytic
spherical harmonics (the reference leans on libsharp here; we must prove
our from-scratch engine, see SURVEY.md section 7 'hard parts' #1)."""

import numpy as np
import pytest
import jax.numpy as jnp

from driftscan_tpu.ops import healpix, sht

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow


NSIDE = 16
LMAX = 16


def _ylm_analytic(l, m, theta, phi):
    from scipy.special import sph_harm_y

    return sph_harm_y(l, m, theta, phi)


@pytest.fixture(scope="module")
def geom():
    return healpix.ring_geometry(NSIDE)


def test_ring_geometry(geom):
    assert geom.npix == 12 * NSIDE**2
    assert geom.nring == 4 * NSIDE - 1
    assert geom.nphi.sum() == geom.npix
    # z strictly decreasing north to south, symmetric
    assert np.all(np.diff(geom.cos_theta) < 0)
    np.testing.assert_allclose(geom.cos_theta, -geom.cos_theta[::-1], atol=1e-14)
    # equator ring exists
    assert np.abs(geom.cos_theta).min() < 1e-14


def test_ang_positions(geom):
    ang = healpix.ang_positions(NSIDE)
    assert ang.shape == (geom.npix, 2)
    assert ang[:, 0].min() > 0 and ang[:, 0].max() < np.pi
    # First pixel of ring 1 at phi = pi/4
    assert np.isclose(ang[0, 1], np.pi / 4)


@pytest.mark.parametrize("l,m", [(0, 0), (1, 0), (2, 1), (5, 3), (10, 10)])
def test_synthesis_matches_analytic_ylm(l, m):
    """Synthesis is exact evaluation of Y_lm at pixel centres."""
    ang = healpix.ang_positions(NSIDE)
    alm = np.zeros((1, LMAX + 1, LMAX + 1), dtype=np.complex128)
    coeff = 0.7 - 0.3j if m > 0 else 1.0
    alm[0, l, m] = coeff
    maps = np.asarray(sht.synthesis_real(alm, NSIDE))[0]
    y = _ylm_analytic(l, m, ang[:, 0], ang[:, 1])
    expect = np.real(coeff * y) * (2.0 if m > 0 else 1.0)
    np.testing.assert_allclose(maps, expect, atol=1e-12)


def test_analysis_roundtrip_real():
    rng = np.random.default_rng(42)
    lmax = 12
    ls = np.arange(lmax + 1)[:, None]
    ms = np.arange(lmax + 1)[None, :]
    a = rng.standard_normal((2, lmax + 1, lmax + 1)) + 1j * rng.standard_normal(
        (2, lmax + 1, lmax + 1)
    )
    a = np.where(ms <= ls, a, 0)
    a[:, :, 0] = a[:, :, 0].real

    maps = sht.synthesis_real(a, NSIDE)
    a2 = np.asarray(sht.analysis(maps, lmax, iters=3)[0])
    mask = ms <= ls
    err = (np.abs(a2 - a) * mask).max() / np.abs(a).max()
    assert err < 1e-6


def test_analysis_complex_field_negative_m():
    """A complex map exercises the independent negative-m coefficients."""
    rng = np.random.default_rng(1)
    lmax = 8
    ang = healpix.ang_positions(NSIDE)

    # Build a complex field with known coefficients including m < 0.
    coeffs = {(2, 1): 0.5 + 0.2j, (3, -2): -0.3 + 0.8j, (4, 0): 1.1 + 0.0j}
    f = np.zeros(ang.shape[0], dtype=np.complex128)
    for (l, m), c in coeffs.items():
        f += c * _ylm_analytic(l, m, ang[:, 0], ang[:, 1])

    pos, neg = sht.analysis(f[None], lmax, neg_m=True, iters=2)
    pos, neg = np.array(pos)[0], np.array(neg)[0]

    assert np.allclose(pos[2, 1], coeffs[(2, 1)], atol=1e-5)
    assert np.allclose(neg[3, 1], coeffs[(3, -2)], atol=1e-5)  # column m-1
    assert np.allclose(pos[4, 0], coeffs[(4, 0)], atol=1e-5)
    # Everything else small
    pos[2, 1] = pos[4, 0] = 0.0
    neg[3, 1] = 0.0
    assert np.abs(pos).max() < 1e-5
    assert np.abs(neg).max() < 1e-5


def test_complex_synthesis_roundtrip():
    rng = np.random.default_rng(7)
    lmax = 10
    g = healpix.ring_geometry(NSIDE)
    f = rng.standard_normal(g.npix) + 1j * rng.standard_normal(g.npix)
    # Band-limit the field first
    pos, neg = sht.analysis(f[None], lmax, neg_m=True, iters=3)
    f_bl = np.asarray(sht.synthesis_complex(pos, neg, NSIDE))
    pos2, neg2 = sht.analysis(f_bl, lmax, neg_m=True, iters=3)
    np.testing.assert_allclose(np.asarray(pos2), np.asarray(pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(neg2), np.asarray(neg), atol=1e-6)


def test_pack_fftlike():
    lmax, lside = 3, 5
    pos = np.zeros((lmax + 1, lmax + 1), dtype=np.complex128)
    neg = np.zeros((lmax + 1, lmax), dtype=np.complex128)
    pos[2, 1] = 1 + 2j
    neg[3, 0] = 4j  # m = -1
    packed = sht.pack_fftlike(pos, neg, lside)
    assert packed.shape == (lside + 1, 2 * lside + 1)
    assert packed[2, 1] == 1 + 2j
    assert packed[3, -1] == 4j


def test_high_m_polar_stability():
    """Legendre recurrence must survive underflow at the poles (large m)."""
    lmax = 3 * 32 - 1
    nside = 32
    g = healpix.ring_geometry(nside)
    # Unit power in the highest (l, m): synth then analyse must round trip.
    alm = np.zeros((1, lmax + 1, lmax + 1), dtype=np.complex128)
    alm[0, lmax, lmax - 1] = 1.0
    alm[0, lmax, 5] = 1.0
    maps = sht.synthesis_real(alm, nside)
    assert np.isfinite(np.asarray(maps)).all()
    a2 = np.asarray(sht.analysis(maps, lmax, iters=3)[0])
    assert np.isfinite(a2).all()
    assert np.abs(a2[0, lmax, lmax - 1] - 1.0) < 1e-2
    assert np.abs(a2[0, lmax, 5] - 1.0) < 1e-2


def test_nside_for_lmax():
    assert healpix.nside_for_lmax(40, accuracy_boost=1) == 64
    assert healpix.nside_for_lmax(1, accuracy_boost=0) >= 1


def test_legendre_table_matches_recurrence(monkeypatch):
    """The device-cached Legendre table path must equal the in-scan
    recurrence path exactly (the table is the same recurrence, computed
    once); a zero cache budget forces the fallback."""
    import numpy as np

    from driftscan_tpu.ops import sht

    rng = np.random.default_rng(5)
    nside, lmax = 8, 12
    maps = rng.standard_normal((2, 12 * nside**2))

    pos_t, _ = sht.analysis(maps, lmax)

    monkeypatch.setenv("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "0")
    pos_r, _ = sht.analysis(maps, lmax)

    np.testing.assert_allclose(
        np.asarray(pos_t), np.asarray(pos_r), rtol=1e-12, atol=1e-14
    )


class TestSplitSynthesis:
    """Split-complex synthesis kernels == native-complex synthesis."""

    nside = 8
    lmax = 12

    def _alm(self, rng, mmax=None):
        mmax = self.lmax if mmax is None else mmax
        pos = rng.standard_normal((2, self.lmax + 1, mmax + 1)) + 1j * rng.standard_normal(
            (2, self.lmax + 1, mmax + 1)
        )
        neg = rng.standard_normal((2, self.lmax + 1, mmax)) + 1j * rng.standard_normal(
            (2, self.lmax + 1, mmax)
        )
        # zero the unphysical l < m entries
        ls = np.arange(self.lmax + 1)[:, None]
        pos *= ls >= np.arange(mmax + 1)[None, :]
        neg *= ls >= np.arange(1, mmax + 1)[None, :]
        return pos, neg

    def test_real_split_matches_native(self):
        from driftscan_tpu.ops import zarray as za

        rng = np.random.default_rng(42)
        pos, _ = self._alm(rng)
        pos[..., 0] = pos[..., 0].real  # m=0 of a real field is real
        native = np.asarray(sht.synthesis_real(pos, self.nside))
        out = sht.synthesis_split(
            za.Z(jnp.asarray(pos.real), jnp.asarray(pos.imag)), None, self.nside
        )
        np.testing.assert_allclose(np.asarray(out.re), native, rtol=1e-10, atol=1e-12)
        assert np.abs(np.asarray(out.im)).max() == 0

    def test_complex_split_matches_native(self):
        from driftscan_tpu.ops import zarray as za

        rng = np.random.default_rng(43)
        pos, neg = self._alm(rng)
        native = np.asarray(sht.synthesis_complex(pos, neg, self.nside))
        out = sht.synthesis_split(
            za.Z(jnp.asarray(pos.real), jnp.asarray(pos.imag)),
            za.Z(jnp.asarray(neg.real), jnp.asarray(neg.imag)),
            self.nside,
        )
        got = np.asarray(out.re) + 1j * np.asarray(out.im)
        np.testing.assert_allclose(got, native, rtol=1e-10, atol=1e-12)

    def test_analysis_split_real_field_flag(self):
        """real_field=True (imag plane None) == full split analysis."""
        rng = np.random.default_rng(44)
        npix = 12 * self.nside**2
        maps = rng.standard_normal((3, npix))
        pr, pi, _, _ = sht._analysis_split(
            jnp.asarray(maps), None, sht.geom_arrays(self.nside), self.nside,
            self.lmax, self.lmax, False, None, real_field=True,
        )
        ref_pos, _ = sht.analysis(maps, self.lmax)
        got = np.asarray(pr) + 1j * np.asarray(pi)
        np.testing.assert_allclose(got, np.asarray(ref_pos), rtol=1e-10, atol=1e-12)

    def test_wrappers_route_split(self, monkeypatch):
        """sphtrans wrappers on a split backend == the native-path output."""
        rng = np.random.default_rng(45)
        npix = 12 * self.nside**2

        sky = rng.standard_normal((2, npix))
        pos_native = sht.sphtrans_sky(sky, lmax=self.lmax)
        cmap = rng.standard_normal(npix) + 1j * rng.standard_normal(npix)
        packed_native = sht.sphtrans_complex(cmap, lmax=self.lmax)
        alm = pos_native.copy()
        inv_native = sht.sphtrans_inv_sky(alm, self.nside)

        monkeypatch.setattr(sht, "_split_backend", lambda: True)
        np.testing.assert_allclose(
            sht.sphtrans_sky(sky, lmax=self.lmax), pos_native, rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            sht.sphtrans_complex(cmap, lmax=self.lmax), packed_native,
            rtol=1e-10, atol=1e-12,
        )
        np.testing.assert_allclose(
            sht.sphtrans_inv_sky(alm, self.nside), inv_native, rtol=1e-10, atol=1e-12
        )


def test_pad_unpad_roundtrip():
    from driftscan_tpu.ops import sht

    rng = np.random.default_rng(5)
    nside = 16
    m = rng.standard_normal((3, 12 * nside**2))
    p = sht.pad_map(m, nside)
    geom = sht.ring_geometry(nside)
    assert p.shape == (3, geom.nring * geom.maxlen)
    np.testing.assert_array_equal(sht.unpad_map(p, nside), m)


def test_analysis_ring_padded_matches_compact():
    import jax.numpy as jnp

    from driftscan_tpu.ops import sht, zarray as za

    rng = np.random.default_rng(6)
    nside, lmax = 16, 20
    m = rng.standard_normal((2, 12 * nside**2)) + 1j * rng.standard_normal(
        (2, 12 * nside**2)
    )
    mp = sht.pad_map(m, nside)

    p1, n1 = sht.analysis(jnp.asarray(m), lmax, neg_m=True)
    p2, n2 = sht.analysis(
        jnp.asarray(mp), lmax, neg_m=True, nside=nside, ring_padded=True
    )
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=1e-13)
    np.testing.assert_allclose(np.asarray(n2), np.asarray(n1), atol=1e-13)

    z = za.of(jnp.asarray(m))
    zp = za.of(jnp.asarray(mp))
    q1, g1 = sht.analysis_split(z, lmax, neg_m=True)
    q2, g2 = sht.analysis_split(
        zp, lmax, neg_m=True, nside=nside, ring_padded=True
    )
    np.testing.assert_allclose(za.to_numpy(q2), za.to_numpy(q1), atol=1e-13)
    np.testing.assert_allclose(za.to_numpy(g2), za.to_numpy(g1), atol=1e-13)

    # windowed entry, padded input
    w1, v1 = sht.analysis_split(z, lmax, neg_m=True, m_window=(4, 9))
    w2, v2 = sht.analysis_split(
        zp, lmax, neg_m=True, m_window=(4, 9), nside=nside, ring_padded=True
    )
    np.testing.assert_allclose(za.to_numpy(w2), za.to_numpy(w1), atol=1e-13)
    np.testing.assert_allclose(za.to_numpy(v2), za.to_numpy(v1), atol=1e-13)


def test_sht_precision_switch_plumbs(monkeypatch):
    """The split-path precision switch traces cleanly and (on CPU, where
    matmul precision is a no-op) leaves results bit-identical."""
    import jax

    from driftscan_tpu.ops import sht, zarray as za

    nside, lmax = 8, 12
    rng = np.random.default_rng(45)
    npix = 12 * nside**2
    maps = za.Z(
        jnp.asarray(rng.standard_normal((2, npix))),
        jnp.asarray(rng.standard_normal((2, npix))),
    )
    pos0, neg0 = sht.analysis_split(maps, lmax, neg_m=True)
    monkeypatch.setattr(sht, "_SHT_PRECISION", "high")
    jax.clear_caches()
    pos1, neg1 = sht.analysis_split(maps, lmax, neg_m=True)
    out1 = sht.synthesis_split(pos1, neg1, nside)
    monkeypatch.setattr(sht, "_SHT_PRECISION", None)
    jax.clear_caches()
    out0 = sht.synthesis_split(pos0, neg0, nside)
    np.testing.assert_array_equal(np.asarray(pos1.re), np.asarray(pos0.re))
    np.testing.assert_array_equal(np.asarray(neg1.im), np.asarray(neg0.im))
    np.testing.assert_array_equal(np.asarray(out1.re), np.asarray(out0.re))
