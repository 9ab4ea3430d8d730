"""regrid_polar: nearest-bin polar->Cartesian resampling.

Pins the vectorised bin-edge-search implementation against a slow
per-pixel loop over the same semantics (reference capability:
/root/reference/drift/util/plotutil.py regrid_polar).
"""

import numpy as np

from driftscan_tpu.util.plotutil import regrid_polar


def _slow_reference(polar_img, r_bins, theta_bins, res):
    axis = np.linspace(r_bins[0], r_bins[-1], res)
    out = np.full((res, res), np.nan, dtype=polar_img.dtype)
    for i in range(res):
        for j in range(res):
            r = np.hypot(axis[i], axis[j])
            th = np.arctan2(axis[j], axis[i])
            ir = int(np.searchsorted(r_bins, r, side="right")) - 1
            it = int(np.searchsorted(theta_bins, th, side="right")) - 1
            if 0 <= ir < len(r_bins) - 1 and 0 <= it < len(theta_bins) - 1:
                out[i, j] = polar_img[ir, it]
    return out


def test_regrid_polar_matches_bruteforce():
    rng = np.random.default_rng(7)
    nr, nt, res = 5, 4, 40
    img = rng.standard_normal((nr, nt))
    r_bins = np.linspace(0.01, 1.0, nr + 1)
    theta_bins = np.linspace(0.0, np.pi / 2, nt + 1)

    got = regrid_polar(img, r_bins, theta_bins, res=res)
    want = _slow_reference(img, r_bins, theta_bins, res)
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    m = ~np.isnan(want)
    np.testing.assert_allclose(got[m], want[m], rtol=0, atol=0)


def test_regrid_polar_domain_mask():
    # Pixels with radius beyond the outer edge must be NaN; the corner
    # (r_bins[0], r_bins[0]) region must be filled.
    img = np.ones((3, 3))
    r_bins = np.linspace(0.0, 1.0, 4)
    theta_bins = np.linspace(0.0, np.pi / 2, 4)
    out = regrid_polar(img, r_bins, theta_bins, res=64)
    assert np.isnan(out[-1, -1])  # radius sqrt(2) > 1
    assert out[0, 0] == 1.0
    # Everything strictly inside the unit quarter-disc is filled
    # (the exact theta = pi/2 edge, i.e. the kpar = 0 row, falls past
    # the last angular bin, matching bin-edge right-open semantics).
    axis = np.linspace(0.0, 1.0, 64)
    rr = np.hypot(axis[:, None], axis[None, :])
    interior = (rr < 0.999) & (axis[:, None] > 0)
    assert not np.isnan(out[interior]).any()
