"""Cylinder feed beam models.

Functional parity with /root/reference/drift/telescope/cylbeam.py: a feed
illuminates a parabolic cylinder; the E-W beam is the Fraunhofer
diffraction pattern of the feed's aperture distribution (computed once per
(fwhm, width) on the host by FFT and interpolated), and the N-S beam is
the ExpTan model.  The per-pixel evaluation is jnp so it batches/fuses on
the TPU.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..ops import kernels


def polpattern(angpos, dipole):
    """Unit polarisation vectors for a dipole direction at each position.

    angpos : (npix, 2) spherical; dipole : (2,) spherical or (3,) cartesian.
    Returns (npix, 2) vectors in the (theta_hat, phi_hat) basis.
    """
    dipole = jnp.asarray(dipole)
    if dipole.shape[0] == 2:
        dipole = kernels.sph_to_cart(dipole)
    cart = kernels.sph_to_cart(jnp.asarray(angpos))
    return kernels.polpattern(cart, dipole)


def beam_dipole(theta, phi, squint):
    """Beam of a dipole above a ground plane."""
    return (1 - jnp.sin(theta) ** 2 * jnp.sin(phi) ** 2) ** (squint / 2) * jnp.sin(
        0.5 * jnp.pi * jnp.cos(theta)
    )


def beam_exptan(sintheta, fwhm):
    """ExpTan feed illumination model (see ops.kernels.beam_exptan)."""
    return kernels.beam_exptan(jnp.asarray(sintheta), fwhm)


@functools.lru_cache(maxsize=100)
def fraunhofer_cylinder(fwhm_x: float, width: float, res: float = 1.0):
    """1-D Fraunhofer diffraction pattern of an ExpTan feed on a cylinder.

    Matches the construction at
    /root/reference/drift/telescope/cylbeam.py:52-95: sample the aperture
    amplitude over sin(angle), zero-pad by ``res * 16``, FFT, normalise to
    unit peak, and return an interpolation table over sin(theta).

    Returns (kx, fx) numpy sample arrays for interpolation.
    """
    resi = int(res * 16)
    num = 512
    hnum = num // 2 - 1

    ua = -1.0 * np.linspace(-1.0, 1.0, num, endpoint=False)[::-1]

    # Aperture amplitude as a function of sin(angle) from feed to cylinder
    st = 2 * ua / (1 + ua**2)
    alpha = np.log(2.0) / (2 * np.tan(fwhm_x / 2.0) ** 2)
    tan2 = st**2 / (1 - st**2 + 1e-100)
    ax = np.exp(-alpha * tan2)

    axe = np.zeros(resi * num)
    axe[: (hnum + 2)] = ax[hnum:]
    axe[-hnum:] = ax[:hnum]

    fx = np.fft.fft(axe).real
    kx = 2 * np.fft.fftfreq(resi * num, ua[1] - ua[0]) / width

    fx = np.fft.fftshift(fx) / fx.max()
    kx = np.fft.fftshift(kx)

    sel = np.abs(kx) < 1.1
    return kx[sel].copy(), fx[sel].copy()


def _basis(zenith, rot):
    that, phat = kernels.thetaphi_plane_cart(jnp.asarray(zenith))
    zhat = kernels.sph_to_cart(jnp.asarray(zenith))
    return kernels.rotate_ypr(jnp.asarray(rot), phat, -that, zhat)


def beam_amp(angpos, zenith, width, fwhm_x, fwhm_y, rot=(0.0, 0.0, 0.0)):
    """Amplitude beam of a cylinder feed over the sky.

    E-W from the Fraunhofer pattern of an ExpTan feed of ``fwhm_x`` on a
    cylinder of ``width`` wavelengths; N-S an ExpTan of ``fwhm_y``.
    """
    xhat, yhat, zhat = _basis(zenith, rot)

    kx, fx = fraunhofer_cylinder(float(fwhm_x), float(width))

    cvec = kernels.sph_to_cart(jnp.asarray(angpos))
    horizon = (cvec @ kernels.sph_to_cart(jnp.asarray(zenith)) > 0.0).astype(
        jnp.float64
    )

    ew_amp = jnp.interp(cvec @ xhat, jnp.asarray(kx), jnp.asarray(fx))
    ns_amp = kernels.beam_exptan(cvec @ yhat, fwhm_y)

    return ew_amp * ns_amp * horizon


def beam_x(angpos, zenith, width, fwhm_e, fwhm_h, rot=(0.0, 0.0, 0.0)):
    """(npix, 2) polarised beam of the X (east-pointing) dipole."""
    xhat, yhat, zhat = _basis(zenith, rot)
    cart = kernels.sph_to_cart(jnp.asarray(angpos))
    pvec = kernels.polpattern(cart, xhat)
    amp = beam_amp(angpos, zenith, width, fwhm_e, fwhm_h, rot=rot)
    return amp[:, None] * pvec


def beam_y(angpos, zenith, width, fwhm_e, fwhm_h, rot=(0.0, 0.0, 0.0)):
    """(npix, 2) polarised beam of the Y (north-pointing) dipole."""
    xhat, yhat, zhat = _basis(zenith, rot)
    cart = kernels.sph_to_cart(jnp.asarray(angpos))
    pvec = kernels.polpattern(cart, yhat)
    # Note swapped fwhm order: H-plane east-west, E-plane north-south.
    amp = beam_amp(angpos, zenith, width, fwhm_h, fwhm_e, rot=rot)
    return amp[:, None] * pvec
