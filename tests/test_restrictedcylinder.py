"""Restricted (declination-strip) cylinder models."""

import numpy as np
import pytest

from driftscan_tpu.telescope import cylinder, restrictedcylinder as rc

PARAMS = dict(
    num_freq=2,
    freq_start=400.0,
    freq_end=420.0,
    num_cylinders=2,
    cylinder_width=2.0,
    num_feeds=2,
    feed_spacing=1.5,
)


def _make(cls, **kw):
    t = cls.from_config({**PARAMS, **kw})
    t._init_trans(t._nside_for(int(np.ceil(t.lmax * t.l_boost))))
    return t


def test_box_mask_confines_beam():
    t = _make(rc.RestrictedCylinder, beam_type="box", beam_height=20.0)
    mask = t._bmask(0, 0)
    zd = t._zenith_distance()

    inside = zd < 0.5 * np.radians(20.0)
    assert set(np.unique(mask)) <= {0.0, 1.0}
    np.testing.assert_array_equal(mask, inside.astype(np.float64))

    # the restricted beam is exactly the plain cylinder beam inside the
    # strip and zero outside it
    plain = _make(cylinder.UnpolarisedCylinderTelescope)
    b_restricted = np.asarray(t.beam(0, 0))
    b_plain = np.asarray(plain.beam(0, 0))
    np.testing.assert_allclose(b_restricted, mask * b_plain, rtol=1e-6)
    assert np.all(b_restricted[~inside] == 0)


def test_gaussian_mask_profile():
    t = _make(rc.RestrictedCylinder, beam_type="gaussian", beam_height=30.0)
    mask = t.bmask_gaussian(0, 0)
    zd = t._zenith_distance()

    # peak at zenith, half power at the half-height
    assert mask.max() <= 1.0 + 1e-12
    at_zenith = mask[np.argmin(zd)]
    assert at_zenith > 0.99
    half = np.radians(15.0)
    i_half = np.argmin(np.abs(zd - half))
    assert abs(mask[i_half] - 0.5) < 0.05


def test_unknown_beam_type_rejected():
    t = _make(rc.RestrictedCylinder, beam_type="tophat")
    with pytest.raises((ValueError, KeyError)):
        t._bmask(0, 0)


def test_polarised_restriction():
    t = _make(rc.RestrictedPolarisedCylinder, beam_type="box", beam_height=25.0)
    bx = np.asarray(t.beamx(0, 0))
    mask = t._bmask(0, 0)
    assert bx.shape[0] == mask.shape[0]
    assert np.all(bx[mask == 0.0] == 0)


def test_restricted_extra_feeds():
    t = _make(rc.RestrictedExtra, extra_feeds=[0.25, 2.75])
    pos = t.feed_positions_cylinder(1)
    assert pos.shape == (PARAMS["num_feeds"] + 2, 2)
    # extra feeds lead, on the right cylinder's x offset
    np.testing.assert_allclose(pos[:2, 1], [0.25, 2.75])
    np.testing.assert_allclose(pos[:, 0], t.cylinder_spacing)
