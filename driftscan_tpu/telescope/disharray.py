"""Simple grid-of-dishes interferometer with an Airy (jinc) beam.

Parity with /root/reference/drift/telescope/disharray.py.
"""

from __future__ import annotations

import numpy as np
from scipy.special import jn

import jax.numpy as jnp

from ..core import telescope
from ..ops import kernels


def jinc(x):
    return 0.5 * (jn(0, x) + jn(2, x))


def beam_circular(angpos, zenith, uv_diameter):
    """Airy beam of a circular dish of uv_diameter wavelengths."""
    cart = np.asarray(kernels.sph_to_cart(jnp.asarray(angpos)))
    zc = np.asarray(kernels.sph_to_cart(jnp.asarray(zenith)))
    x = (1.0 - (cart @ zc) ** 2) ** 0.5 * np.pi * uv_diameter
    return 2 * jinc(x)


class DishArray(telescope.SimpleUnpolarisedTelescope):
    """A rectangular grid of identical circular dishes."""

    dish_width = 3.5

    gridu = 4
    gridv = 4

    freq_lower = 1000.0
    freq_upper = 1200.0
    num_freq = 100

    _bc_freq = None
    _bc_nside = None

    @property
    def u_width(self):
        return self.dish_width

    @property
    def v_width(self):
        return self.dish_width

    def beam(self, feed, freq):
        if self._bc_freq != freq or self._bc_nside != self._nside:
            self._bc_map = beam_circular(
                self._angpos, self.zenith, self.dish_width / self.wavelengths[freq]
            )
            self._bc_freq = freq
            self._bc_nside = self._nside
        return self._bc_map

    beamx = beam
    beamy = beam

    @property
    def _single_feedpositions(self):
        pos = np.zeros((self.gridu, self.gridv, 2))
        for i in range(self.gridu):
            for j in range(self.gridv):
                pos[i, j, 0] = i * self.dish_width
                pos[i, j, 1] = j * self.dish_width
        return pos.reshape((self.gridu * self.gridv, 2))
