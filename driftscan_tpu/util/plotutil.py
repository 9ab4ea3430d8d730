"""Plotting helpers (parity with /root/reference/drift/util/plotutil.py)."""

from __future__ import annotations

import numpy as np


def regrid_polar(polar_img, r_bins, theta_bins, res: int = 1024):
    """Regrid an (r, theta) quarter-plane image onto Cartesian (rx, ry).

    Useful for mapping (k, theta) Fisher errors into (kpar, kperp).

    Parameters
    ----------
    polar_img : (num_r, num_theta)
        Values on the polar grid.
    r_bins : (num_r + 1,)
        Radial bin boundaries.
    theta_bins : (num_theta + 1,)
        Angular bin boundaries.
    res : int
        Pixels per side of the Cartesian output.

    Returns
    -------
    cart_img : (res, res) with NaN outside the polar coverage.
    """
    ra = np.linspace(r_bins[0], r_bins[-1], res, endpoint=True)

    rpar = ra[:, np.newaxis]
    rperp = ra[np.newaxis, :]

    r = (rpar**2 + rperp**2) ** 0.5
    with np.errstate(invalid="ignore", divide="ignore"):
        th = np.arccos(np.clip(rpar / np.where(r == 0.0, 1.0, r), -1.0, 1.0))
    th[0, 0] = 0.0

    rbin = (np.digitize(r.flatten(), r_bins) - 1).reshape(r.shape)
    tbin = (np.digitize(th.flatten(), theta_bins) - 1).reshape(th.shape)

    ia = np.where(
        np.logical_and(tbin < (len(theta_bins) - 1), rbin < (len(r_bins) - 1))
    )

    cart_img = np.full((res, res), np.nan, dtype=np.asarray(polar_img).dtype)
    cart_img[ia] = np.asarray(polar_img)[rbin[ia], tbin[ia]]

    return cart_img
