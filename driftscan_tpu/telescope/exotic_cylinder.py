"""Exotic cylinder layouts and perturbed-beam analysis.

Parity with /root/reference/drift/telescope/exotic_cylinder.py: randomised
and gradient feed spacings, extra-feed variants, and CylinderPerturbed
whose doubled beamclasses hold beam-width derivative "feeds" for
perturbative beam analysis.
"""

from __future__ import annotations

import numpy as np

from .. import config
from . import cylbeam, cylinder


class RandomCylinder(cylinder.UnpolarisedCylinderTelescope):
    """Feeds jittered around the regular grid (seeded per cylinder)."""

    pos_sigma = 0.5

    def feed_positions_cylinder(self, cylinder_index):
        pos = super().feed_positions_cylinder(cylinder_index)

        rng = np.random.RandomState(cylinder_index)
        p1 = np.sort(
            pos[:, 1]
            + self.pos_sigma * self.feed_spacing * rng.standard_normal(pos.shape[0])
        )
        pos[:, 1] = p1
        return pos


class GradientCylinder(cylinder.UnpolarisedCylinderTelescope):
    """Quadratically increasing feed spacing (dense centre, sparse ends)."""

    min_spacing = config.Property(proptype=float, default=-1.0)
    max_spacing = config.Property(proptype=float, default=20.0)

    def feed_positions_cylinder(self, cylinder_index):
        if cylinder_index >= self.num_cylinders or cylinder_index < 0:
            raise ValueError("Cylinder index is invalid.")

        nf = self.num_feeds
        a = self.wavelengths[-1] / 2.0 if self.min_spacing < 0.0 else self.min_spacing
        b = 2.0 * (self.max_spacing - a * (nf - 1)) / (nf - 1) ** 2.0

        i = np.arange(nf)
        pos = np.empty([nf, 2], dtype=np.float64)
        pos[:, 0] = cylinder_index * self.cylinder_spacing
        pos[:, 1] = a * i + 0.5 * b * i**2
        return pos


class CylinderExtra(cylinder.UnpolarisedCylinderTelescope):
    """Regular cylinder with extra feeds at explicit positions."""

    extra_feeds = config.Property(proptype=np.array, default=np.zeros(0))

    def feed_positions_cylinder(self, cylinder_index):
        pos = super().feed_positions_cylinder(cylinder_index)

        nextra = self.extra_feeds.shape[0]
        pos2 = np.zeros((pos.shape[0] + nextra, 2), dtype=np.float64)
        pos2[nextra:] = pos
        pos2[:nextra, 0] = cylinder_index * self.cylinder_spacing
        pos2[:nextra, 1] = self.extra_feeds
        return pos2


class CylinderShift(cylinder.UnpolarisedCylinderTelescope):
    """Cylinder with all feeds shifted along the cylinder."""

    shift = config.Property(proptype=float, default=0.0)

    def feed_positions_cylinder(self, cylinder_index):
        pos = super().feed_positions_cylinder(cylinder_index)
        pos[:, 1] += self.shift * cylinder_index
        return pos


class CylinderPerturbed(cylinder.PolarisedCylinderTelescope):
    """Polarised cylinder with perturbation "feeds".

    Beamclasses double up: even classes are the X/Y fiducial beams, and
    each extra perturbation adds classes holding the numerical derivative
    of the beam with respect to the E-plane width.
    """

    npert = 2

    @property
    def beamclass(self):
        nsfeed = self._single_feedpositions.shape[0]
        beamclass = [bc * np.ones(nsfeed) for bc in range(2 * self.npert)]
        return np.concatenate(beamclass).astype(np.int64)

    @property
    def feedpositions(self):
        beampos = [self._single_feedpositions for bc in range(2 * self.npert)]
        return np.concatenate(beampos)

    def _beam_derivative(self, beamfunc, feed, freq):
        """d(beam)/d(fwhm_e) by forward difference (1% step)."""
        width = self.cylinder_width / self.wavelengths[freq]
        beam0 = beamfunc(
            self._angpos, self.zenith, width, self.fwhm_e, self.fwhm_h
        )
        beam1 = beamfunc(
            self._angpos, self.zenith, width, self.fwhm_e * 1.01, self.fwhm_h
        )
        return (np.asarray(beam1) - np.asarray(beam0)) / (0.01 * self.fwhm_e)

    def beamx(self, feed, freq):
        beampert = int(self.beamclass[feed] // 2)
        if beampert == 0:
            return cylbeam.beam_x(
                self._angpos,
                self.zenith,
                self.cylinder_width / self.wavelengths[freq],
                self.fwhm_e,
                self.fwhm_h,
            )
        if beampert == 1:
            return self._beam_derivative(cylbeam.beam_x, feed, freq)
        raise ValueError(f"Unsupported perturbation index {beampert}")

    def beamy(self, feed, freq):
        beampert = int(self.beamclass[feed] // 2)
        if beampert == 0:
            return cylbeam.beam_y(
                self._angpos,
                self.zenith,
                self.cylinder_width / self.wavelengths[freq],
                self.fwhm_e,
                self.fwhm_h,
            )
        if beampert == 1:
            return self._beam_derivative(cylbeam.beam_y, feed, freq)
        raise ValueError(f"Unsupported perturbation index {beampert}")
