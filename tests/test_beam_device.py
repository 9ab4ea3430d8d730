"""Device-evaluated cylinder beams match the host evaluation.

The accelerator path (cylbeam.beam_device) reimplements beam_amp /
beam_x / beam_y against the device pixel grid with a uniform-grid
interpolation of the Fraunhofer table; these tests pin it to the host
path (reference physics: /root/reference/drift/telescope/cylbeam.py)
and check the override gate falls back for subclassed beam physics.
"""

import numpy as np

from driftscan_tpu.ops import sht
from driftscan_tpu.telescope import cylinder


def _mktel(cls, **kw):
    conf = dict(
        num_freq=2,
        freq_start=400.0,
        freq_end=500.0,
        num_cylinders=2,
        cylinder_width=10.0,
        num_feeds=2,
        feed_spacing=2.0,
        single_precision=True,
    )
    conf.update(kw)
    return cls.from_config(conf)


def test_polarised_device_beam_matches_host():
    tel = _mktel(cylinder.PolarisedCylinderTelescope)
    tel._init_trans(64)
    for feed in (0, tel.nfeed // 2):  # one X feed, one Y feed
        for fi in range(tel.nfreq):
            # the device grid is ring-padded: unpad before comparing
            dev = sht.unpad_map(
                np.moveaxis(np.asarray(tel._beam_device_eval(feed, fi)), 0, -1),
                tel._nside,
            )
            host = np.moveaxis(tel._beam(feed, fi), 0, -1)
            assert dev.shape == host.shape
            assert dev.dtype == np.float32
            np.testing.assert_allclose(dev, host, atol=2e-5)


def test_unpolarised_device_beam_matches_host():
    tel = _mktel(cylinder.UnpolarisedCylinderTelescope)
    tel._init_trans(64)
    for fi in range(tel.nfreq):
        dev = sht.unpad_map(np.asarray(tel._beam_device_eval(0, fi)), tel._nside)
        host = tel._beam(0, fi)
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=2e-5)


def test_device_beam_feeds_the_device_cache():
    tel = _mktel(cylinder.PolarisedCylinderTelescope)
    tel._init_trans(64)
    beam = np.asarray(tel._beam_device(0, 0))
    # host-side cache must not have been populated by the device path
    assert not tel._beam_cache
    got = sht.unpad_map(np.moveaxis(beam, 0, -1), tel._nside)
    np.testing.assert_allclose(got, np.moveaxis(tel._beam(0, 0), 0, -1), atol=2e-5)


def test_subclassed_beam_physics_falls_back_to_host():
    class Perturbed(cylinder.PolarisedCylinderTelescope):
        def beamx(self, feed, freq):
            return 2.0 * super().beamx(feed, freq)

    tel = _mktel(Perturbed)
    tel._init_trans(64)
    assert tel._beam_device_eval(0, 0) is None
    # _beam_device still works via the host path (padded on upload) and
    # sees the override
    dev = sht.unpad_map(
        np.moveaxis(np.asarray(tel._beam_device(0, 0)), 0, -1), tel._nside
    )
    np.testing.assert_allclose(dev, np.moveaxis(tel._beam(0, 0), 0, -1), atol=2e-5)
    base = _mktel(cylinder.PolarisedCylinderTelescope)
    base._init_trans(64)
    np.testing.assert_allclose(
        dev, 2.0 * np.moveaxis(np.asarray(base._beam(0, 0)), 0, -1), atol=4e-5
    )


def test_double_precision_falls_back_to_host():
    tel = _mktel(cylinder.PolarisedCylinderTelescope, single_precision=False)
    tel._init_trans(64)
    assert tel._beam_device_eval(0, 0) is None
