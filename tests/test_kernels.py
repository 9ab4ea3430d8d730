import jax.numpy as jnp
import numpy as np

from driftscan_tpu.ops import healpix, kernels

NSIDE = 8
ZENITH = np.array([np.pi / 4, 0.0])


def _cart(nside=NSIDE):
    ang = healpix.ang_positions(nside)
    return np.asarray(kernels.sph_to_cart(jnp.asarray(ang))), ang


def test_sph_to_cart_units():
    cart, _ = _cart()
    np.testing.assert_allclose(np.sum(cart**2, axis=-1), 1.0, atol=1e-12)


def test_fringe_direct():
    cart, ang = _cart()
    uv = np.array([3.0, -2.0])
    fr = np.asarray(kernels.fringe(jnp.asarray(cart), jnp.asarray(ZENITH), uv))

    # Direct evaluation
    that, phat = kernels.thetaphi_plane_cart(jnp.asarray(ZENITH))
    uv3 = uv[0] * np.asarray(phat) + uv[1] * (-np.asarray(that))
    expect = np.exp(2j * np.pi * (cart @ uv3))
    np.testing.assert_allclose(fr, expect, atol=1e-12)
    np.testing.assert_allclose(np.abs(fr), 1.0, atol=1e-12)


def test_fringe_batched():
    cart, _ = _cart()
    uvs = np.array([[1.0, 0.0], [0.0, 2.0], [1.5, -0.5]])
    fr = np.asarray(kernels.fringe(jnp.asarray(cart), jnp.asarray(ZENITH), uvs))
    assert fr.shape == (3, cart.shape[0])
    f0 = np.asarray(kernels.fringe(jnp.asarray(cart), jnp.asarray(ZENITH), uvs[0]))
    np.testing.assert_allclose(fr[0], f0, atol=1e-13)


def test_horizon():
    cart, _ = _cart()
    h = np.asarray(kernels.horizon_mask(jnp.asarray(cart), jnp.asarray(ZENITH)))
    zc = np.asarray(kernels.sph_to_cart(jnp.asarray(ZENITH)))
    assert set(np.unique(h)) <= {0.0, 1.0}
    assert np.array_equal(h > 0, (cart @ zc) > 0)


def test_stokes_visibility_real_beams():
    """Check the fused Stokes kernel against the reference formulas
    (/root/reference/drift/util/_fast_tools.pyx:94-164)."""
    rng = np.random.default_rng(3)
    cart, _ = _cart()
    n = cart.shape[0]
    beami = rng.standard_normal((n, 2))
    beamj = rng.standard_normal((n, 2))
    fr = np.exp(2j * np.pi * rng.random(n))
    horizon = (rng.random(n) > 0.3).astype(np.float64)

    bt = np.asarray(
        kernels.stokes_visibility(
            jnp.asarray(beami), jnp.asarray(beamj), jnp.asarray(fr), jnp.asarray(horizon)
        )
    )

    om_i = np.sum((beami**2).sum(axis=1) * horizon) * 4 * np.pi / n
    om_j = np.sum((beamj**2).sum(axis=1) * horizon) * 4 * np.pi / n
    pre = 1.0 / np.sqrt(om_i * om_j)
    tc = pre * fr * horizon

    expect_i = tc * (beami[:, 0] * beamj[:, 0] + beami[:, 1] * beamj[:, 1])
    expect_q = tc * (beami[:, 0] * beamj[:, 0] - beami[:, 1] * beamj[:, 1])
    expect_u = tc * (beami[:, 0] * beamj[:, 1] + beami[:, 1] * beamj[:, 0])
    expect_v = 1j * tc * (beami[:, 0] * beamj[:, 1] - beami[:, 1] * beamj[:, 0])

    np.testing.assert_allclose(bt[0], expect_i, atol=1e-12)
    np.testing.assert_allclose(bt[1], expect_q, atol=1e-12)
    np.testing.assert_allclose(bt[2], expect_u, atol=1e-12)
    np.testing.assert_allclose(bt[3], expect_v, atol=1e-12)


def test_stokes_visibility_complex_conjugation():
    rng = np.random.default_rng(4)
    cart, _ = _cart()
    n = cart.shape[0]
    beami = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    beamj = rng.standard_normal((n, 2)) + 1j * rng.standard_normal((n, 2))
    fr = np.exp(2j * np.pi * rng.random(n))
    horizon = np.ones(n)

    bt = np.asarray(
        kernels.stokes_visibility(
            jnp.asarray(beami), jnp.asarray(beamj), jnp.asarray(fr), jnp.asarray(horizon)
        )
    )
    om_i = np.sum(np.abs(beami) ** 2) * 4 * np.pi / n
    om_j = np.sum(np.abs(beamj) ** 2) * 4 * np.pi / n
    tc = fr / np.sqrt(om_i * om_j)
    expect_i = tc * (
        beami[:, 0] * beamj[:, 0].conj() + beami[:, 1] * beamj[:, 1].conj()
    )
    np.testing.assert_allclose(bt[0], expect_i, atol=1e-12)


def test_exptan():
    st = np.linspace(-0.9, 0.9, 64)
    fwhm = 0.7
    out = np.asarray(kernels.beam_exptan(jnp.asarray(st), fwhm))
    alpha = np.log(2.0) / (2 * np.tan(fwhm / 2.0) ** 2)
    expect = np.exp(-alpha * st**2 / (1 - st**2 + 1e-100))
    np.testing.assert_allclose(out, expect, rtol=1e-12)
    # Half power at sin(fwhm/2) for small angles: amplitude^2 = 0.5 at theta=fwhm/2
    amp = np.asarray(kernels.beam_exptan(jnp.asarray(np.sin(fwhm / 2)), fwhm))
    assert abs(amp**2 - 0.5) < 1e-10


def test_unpolarised_visibility_norm():
    rng = np.random.default_rng(5)
    cart, _ = _cart()
    n = cart.shape[0]
    beam = np.abs(rng.standard_normal(n)) + 0.1
    horizon = np.ones(n)
    fr = np.ones(n, dtype=complex)
    cv = np.asarray(
        kernels.unpolarised_visibility(
            jnp.asarray(beam), jnp.asarray(beam), jnp.asarray(fr), jnp.asarray(horizon)
        )
    )
    # With identical beams and unit fringe: cv = beam^2 / Omega_A, so the
    # integral over the sky is exactly 1.
    total = (cv.sum() * 4 * np.pi / n).real
    np.testing.assert_allclose(total, 1.0, rtol=1e-12)
    assert np.abs(cv.imag).max() < 1e-12
