"""Legacy cylinder model using simple sinc beams.

Parity with /root/reference/drift/telescope/oldcylinder.py.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import config
from ..core import telescope, visibility
from ..ops import kernels
from . import cylinder as newcylinder


class CylinderTelescope(newcylinder.CylinderTelescope):
    """Legacy cylinder base (layout identical to the modern class)."""


class UnpolarisedCylinderTelescope(
    CylinderTelescope, telescope.SimpleUnpolarisedTelescope
):
    """Unpolarised cylinder with a sinc E-W beam."""

    def beam(self, feed, freq):
        return visibility.cylinder_beam(
            self._angpos, self.zenith, self.cylinder_width / self.wavelengths[freq]
        )


class PolarisedCylinderTelescope(
    CylinderTelescope, telescope.SimplePolarisedTelescope
):
    """Legacy polarised cylinder: sinc beams on fixed polarisation axes."""

    illumination_x = config.Property(proptype=float, default=1.0)
    illumination_y = config.Property(proptype=float, default=1.0)

    ortho_pol = config.Property(proptype=bool, default=True)

    def _pol_beam(self, bpat, along_phi):
        bm = np.zeros(self._angpos.shape, dtype=np.float64)
        if self.ortho_pol:
            bm[:, 1 if along_phi else 0] = bpat
        else:
            thatz, phatz = (
                np.asarray(v)
                for v in kernels.thetaphi_plane_cart(jnp.asarray(self.zenith))
            )
            thatp, phatp = (
                np.asarray(v)
                for v in kernels.thetaphi_plane_cart(jnp.asarray(self._angpos))
            )
            ref = phatz if along_phi else thatz
            bm[:, 0] = (thatp @ ref) * bpat
            bm[:, 1] = (phatp @ ref) * bpat
        return bm

    def beamx(self, feed, freq):
        bpat = visibility.cylinder_beam(
            self._angpos,
            self.zenith,
            self.illumination_x * self.cylinder_width / self.wavelengths[freq],
        )
        return self._pol_beam(bpat, along_phi=True)

    def beamy(self, feed, freq):
        bpat = visibility.cylinder_beam(
            self._angpos,
            self.zenith,
            self.illumination_y * self.cylinder_width / self.wavelengths[freq],
        )
        return self._pol_beam(bpat, along_phi=False)
