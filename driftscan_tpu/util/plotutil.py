"""Plotting helpers.

Capability parity target: the polar-to-Cartesian regridder the reference
ships for visualising Fisher forecast errors
(/root/reference/drift/util/plotutil.py). Implementation here is an
independent bin-edge-search formulation.
"""

from __future__ import annotations

import numpy as np


def regrid_polar(polar_img, r_bins, theta_bins, res: int = 1024):
    """Resample a binned quarter-plane polar image onto a Cartesian grid.

    The input lives on an ``(r, theta)`` grid of bins — e.g. power-spectrum
    Fisher errors binned in ``(k, theta)`` — and the output is the same
    field sampled on a square ``(k_par, k_perp)`` grid, nearest-bin lookup,
    with NaN wherever a Cartesian pixel falls outside the binned domain.

    Parameters
    ----------
    polar_img : array_like, shape (num_r, num_theta)
        One value per polar bin.
    r_bins : array_like, shape (num_r + 1,)
        Monotonic radial bin edges.
    theta_bins : array_like, shape (num_theta + 1,)
        Monotonic angular bin edges (radians, 0 = parallel axis).
    res : int
        Output pixels per side.

    Returns
    -------
    cart_img : np.ndarray, shape (res, res)
        Row index is the parallel component, column the perpendicular.
    """
    polar_img = np.asarray(polar_img)
    r_bins = np.asarray(r_bins, dtype=np.float64)
    theta_bins = np.asarray(theta_bins, dtype=np.float64)

    axis = np.linspace(r_bins[0], r_bins[-1], res)
    kpar, kperp = np.meshgrid(axis, axis, indexing="ij")

    radius = np.hypot(kpar, kperp)
    # Angle measured off the parallel axis; arctan2 is exact at the
    # origin (returns 0) so no special-casing of the corner pixel.
    angle = np.arctan2(kperp, kpar)

    # Map each pixel to its polar bin by edge search.  side="right" puts
    # a sample sitting exactly on an interior edge into the bin above it.
    ir = np.searchsorted(r_bins, radius, side="right") - 1
    it = np.searchsorted(theta_bins, angle, side="right") - 1

    inside = (
        (ir >= 0)
        & (ir < len(r_bins) - 1)
        & (it >= 0)
        & (it < len(theta_bins) - 1)
    )

    cart_img = np.full((res, res), np.nan, dtype=polar_img.dtype)
    cart_img[inside] = polar_img[ir[inside], it[inside]]
    return cart_img
