"""Cylinders with a restricted declination strip.

Parity with /root/reference/drift/telescope/restrictedcylinder.py: apply a
Gaussian or box mask in zenith-distance to the cylinder beams.
"""

from __future__ import annotations

import numpy as np

from .. import config
from . import cylinder


def gaussian_fwhm(x, fwhm):
    sigma = fwhm / (8.0 * np.log(2.0)) ** 0.5
    return np.exp(-(x**2) / (2 * sigma**2))


class RestrictedBeam(cylinder.CylinderTelescope):
    beam_height = config.Property(proptype=float, default=30.0)
    beam_type = config.Property(proptype=str, default="box")

    def _bdist(self):
        pointing = self.zenith
        bdist = self._angpos - pointing[np.newaxis, :]
        bdist = np.abs(
            np.where(
                (bdist[:, 1] < np.pi)[:, np.newaxis],
                bdist,
                bdist - np.array([0, 2 * np.pi])[np.newaxis, :],
            )
        )
        return bdist

    def bmask_gaussian(self, feed, freq):
        bdist = self._bdist()
        return gaussian_fwhm(bdist[:, 0], np.radians(self.beam_height))

    def bmask_box(self, feed, freq):
        bdist = self._bdist()
        return (np.abs(bdist[:, 0] / np.radians(self.beam_height)) < 0.5).astype(
            np.float64
        )

    def _bmask(self, feed, freq):
        bdict = {"gaussian": self.bmask_gaussian, "box": self.bmask_box}
        return bdict[self.beam_type](feed, freq)


class RestrictedCylinder(RestrictedBeam, cylinder.UnpolarisedCylinderTelescope):
    def beam(self, *args, **kwargs):
        return self._bmask(*args, **kwargs) * np.asarray(
            cylinder.UnpolarisedCylinderTelescope.beam(self, *args, **kwargs)
        )


class RestrictedPolarisedCylinder(
    RestrictedBeam, cylinder.PolarisedCylinderTelescope
):
    def beamx(self, *args, **kwargs):
        return self._bmask(*args, **kwargs)[:, np.newaxis] * np.asarray(
            cylinder.PolarisedCylinderTelescope.beamx(self, *args, **kwargs)
        )

    def beamy(self, *args, **kwargs):
        return self._bmask(*args, **kwargs)[:, np.newaxis] * np.asarray(
            cylinder.PolarisedCylinderTelescope.beamy(self, *args, **kwargs)
        )


class RestrictedExtra(RestrictedCylinder):
    """Restricted cylinder with extra irregularly placed feeds."""

    extra_feeds = config.Property(proptype=np.array, default=np.zeros(0))

    def feed_positions_cylinder(self, cylinder_index):
        pos = super().feed_positions_cylinder(cylinder_index)

        nextra = self.extra_feeds.shape[0]
        pos2 = np.zeros((pos.shape[0] + nextra, 2), dtype=np.float64)
        pos2[nextra:] = pos
        pos2[:nextra, 0] = cylinder_index * self.cylinder_spacing
        pos2[:nextra, 1] = self.extra_feeds
        return pos2
