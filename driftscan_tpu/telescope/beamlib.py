"""Shared primary-beam building blocks for the dish-style telescopes.

Airy (jinc) patterns for uniform circular apertures and Gaussian beams,
plus a tiny per-(freq, nside) memoisation mixin.  Used by the dish-array,
GMRT and focal-plane models (the reference repeats these formulas in each
of /root/reference/drift/telescope/{disharray,gmrt,focalplane}.py).
"""

from __future__ import annotations

import numpy as np
from scipy.special import jn

import jax.numpy as jnp

from ..ops import kernels


def jinc(x):
    """Radial profile of a uniform circular aperture."""
    return 0.5 * (jn(0, x) + jn(2, x))


def _cart(sph):
    return np.asarray(kernels.sph_to_cart(jnp.asarray(sph)))


def sin_offset(angpos, centre):
    """sin of the angle between each position and a centre direction."""
    c = _cart(angpos) @ _cart(centre)
    return np.sqrt(np.maximum(1.0 - c * c, 0.0))


def beam_circular(angpos, zenith, uv_diameter):
    """Airy beam of a circular dish of ``uv_diameter`` wavelengths."""
    return 2 * jinc(np.pi * uv_diameter * sin_offset(angpos, zenith))


def beam_gaussian(angpos, pointing, sigma):
    """Gaussian beam of width ``sigma`` (radians) about a pointing."""
    s = sin_offset(angpos, pointing)
    return np.exp(-(s * s) / (4 * sigma**2))


def fwhm_to_sigma(fwhm_deg):
    """Gaussian sigma (radians) from a FWHM in degrees."""
    return np.radians(fwhm_deg) / np.sqrt(8.0 * np.log(2.0))


class MemoisedBeam:
    """Cache the most recent beam map, keyed on (freq index, nside).

    Dish beams depend only on frequency (not feed), so the transfer
    driver re-requests the identical map for every feed; recomputing it
    per feed would dominate the host time.
    """

    _beam_key = None
    _beam_map = None

    def _memo_beam(self, build, freq):
        key = (freq, self._nside)
        if self._beam_key != key:
            self._beam_map = build()
            self._beam_key = key
        return self._beam_map
