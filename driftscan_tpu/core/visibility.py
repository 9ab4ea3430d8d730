"""Full-sky visibility primitives.

Functional parity with /root/reference/drift/core/visibility.py, built on
the fused jnp kernels in :mod:`driftscan_tpu.ops.kernels` (which replace
the Cython ``_fast_tools`` fringe).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import kernels


def uv_plane_cart(zenith):
    """Unit vectors (uhat east, vhat north) spanning the UV plane."""
    that, phat = kernels.thetaphi_plane_cart(jnp.asarray(zenith))
    return np.asarray(phat), -np.asarray(that)


def horizon(sph_arr, zenith):
    """Horizon function: 1 above the horizon, 0 below."""
    cart = kernels.sph_to_cart(jnp.asarray(sph_arr))
    return np.asarray(kernels.horizon_mask(cart, jnp.asarray(zenith)))


def fringe(sph_arr, zenith, uv):
    """Fringe exp(2 pi i n.u) at each angular position (numpy facing)."""
    cart = kernels.sph_to_cart(jnp.asarray(sph_arr))
    return np.asarray(kernels.fringe(cart, jnp.asarray(zenith), jnp.asarray(uv)))


def cylinder_beam(sph_arr, zenith, cylwidth):
    """Simple sinc beam of an N-S cylinder of the given width (wavelengths).

    Matches /root/reference/drift/core/visibility.py:49-73 (normalised sinc).
    """
    uhatc, _ = uv_plane_cart(zenith)
    cart = np.asarray(kernels.sph_to_cart(jnp.asarray(sph_arr)))
    return np.sinc(np.inner(cart, cylwidth * uhatc))


def pol_IQU(sph_arr, zenith, feed1, feed2):
    """I/Q/U polarisation tensors projected onto two feed directions.

    Matches /root/reference/drift/core/visibility.py:76-125.
    """
    sph = jnp.asarray(sph_arr)
    that, phat = kernels.thetaphi_plane_cart(sph)
    uhat, vhat = uv_plane_cart(zenith)

    f1c = feed1[0] * uhat + feed1[1] * vhat
    f2c = feed2[0] * uhat + feed2[1] * vhat

    f1_t = np.inner(np.asarray(that), f1c)
    f1_p = np.inner(np.asarray(phat), f1c)
    f2_t = np.inner(np.asarray(that), f2c)
    f2_p = np.inner(np.asarray(phat), f2c)

    pI = 0.5 * (f1_t * f2_t + f1_p * f2_p)
    pQ = 0.5 * (f1_t * f2_t - f1_p * f2_p)
    pU = 0.5 * (f1_t * f2_p + f1_p * f2_t)

    return pI, pQ, pU
