"""GMRT dish array model (parity with /root/reference/drift/telescope/gmrt.py).

Antenna (x, y) positions ship as package data (public observatory layout).
"""

from __future__ import annotations

import os.path

import numpy as np
from scipy.special import jn

from .. import config
from ..core import telescope
from ..ops import kernels

import jax.numpy as jnp


def jinc(x):
    return 0.5 * (jn(0, x) + jn(2, x))


def beam_circular(angpos, zenith, uv_diameter):
    """Airy-style beam of a circular dish of uv_diameter wavelengths."""
    cart = np.asarray(kernels.sph_to_cart(jnp.asarray(angpos)))
    zc = np.asarray(kernels.sph_to_cart(jnp.asarray(zenith)))
    x = (1.0 - (cart @ zc) ** 2) ** 0.5 * np.pi * uv_diameter
    return 2 * jinc(x)


class GmrtArray(telescope.TransitTelescope):
    """The GMRT 30-dish array with a Gaussian primary beam."""

    fwhm = 3.1  # degrees

    freq_lower = 139.33
    freq_upper = 156.00
    num_freq = 64

    _pos_file = os.path.dirname(__file__) + "/gmrtpositions.dat"

    _bc_freq = None
    _bc_nside = None

    _positions = None

    pointing = config.Property(proptype=float, default=0.0)

    dish_width = 45.0
    tsys_flat = 582.0
    minlength = 0.0
    maxlength = 600.0

    def __init__(self, pointing=0.0):
        super().__init__(latitude=19.09, longitude=74.05)
        self._positions = np.loadtxt(self._pos_file)
        self.pointing = pointing

    @property
    def u_width(self):
        return self.dish_width

    @property
    def v_width(self):
        return self.dish_width

    def beam(self, feed, freq):
        """Gaussian beam pointed `pointing` degrees from zenith in dec."""
        if self._bc_freq != freq or self._bc_nside != self._nside:
            sigma = (
                np.radians(self.fwhm)
                / (8.0 * np.log(2.0)) ** 0.5
                / (self.frequencies[freq] / 150.0)
            )
            pointing = np.array(
                [np.pi / 2.0 - np.radians(self.pointing), self.zenith[1]]
            )
            cart = np.asarray(kernels.sph_to_cart(jnp.asarray(self._angpos)))
            pc = np.asarray(kernels.sph_to_cart(jnp.asarray(pointing)))
            x2 = (1.0 - (cart @ pc) ** 2) / (4 * sigma**2)
            self._bc_map = np.exp(-x2)
            self._bc_freq = freq
            self._bc_nside = self._nside
        return self._bc_map

    beamx = beam
    beamy = beam

    @property
    def _single_feedpositions(self):
        if self._positions is None:
            self._positions = np.loadtxt(self._pos_file)
        return self._positions


class GmrtUnpolarised(GmrtArray, telescope.SimpleUnpolarisedTelescope):
    """Unpolarised GMRT."""
