"""Tests of the SimplePolarisedTelescope ABC with a minimal dummy
instrument (the analogue of the reference's
tests/test_simplepolarizationtelescope.py)."""

import numpy as np
import pytest

from driftscan_tpu.core import telescope


class DummyPolarisedTelescope(telescope.SimplePolarisedTelescope):
    """Minimal concrete polarised telescope: fixed feeds, delta-ish beams."""

    num_freq = 2
    freq_start = 100.0
    freq_end = 110.0
    freq_mode = "edge"

    @property
    def _single_feedpositions(self):
        return np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 4.0]])

    @property
    def u_width(self):
        return 1.0

    @property
    def v_width(self):
        return 1.0

    def beamx(self, feed, freq):
        b = np.zeros((self._angpos.shape[0], 2))
        b[:, 1] = 1.0  # pure phi_hat
        return b

    def beamy(self, feed, freq):
        b = np.zeros((self._angpos.shape[0], 2))
        b[:, 0] = 1.0  # pure theta_hat
        return b


@pytest.fixture(scope="module")
def tel():
    t = DummyPolarisedTelescope()
    t.calculate_feedpairs()
    return t


def test_feed_layout(tel):
    # X feeds then Y feeds at the same positions
    assert tel.nfeed == 6
    np.testing.assert_array_equal(tel.beamclass, [0, 0, 0, 1, 1, 1])
    np.testing.assert_allclose(tel.feedpositions[:3], tel.feedpositions[3:])


def test_polarisation_map(tel):
    pol = tel.polarisation
    assert list(pol) == ["X", "X", "X", "Y", "Y", "Y"]


def test_beam_dispatch(tel):
    tel._init_trans(8)
    bx = tel.beam(0, 0)  # feed 0 -> X
    by = tel.beam(3, 0)  # feed 3 -> Y
    assert np.all(bx[:, 1] == 1.0) and np.all(bx[:, 0] == 0.0)
    assert np.all(by[:, 0] == 1.0) and np.all(by[:, 1] == 0.0)


def test_pair_classes(tel):
    """Baselines distinguish XX, XY, YX, YY combinations."""
    up = tel.uniquepairs
    bc = tel.beamclass
    combos = {(bc[i], bc[j]) for i, j in up}
    # All four polarisation pair classes appear among the unique pairs
    assert (0, 0) in combos
    assert (1, 1) in combos
    assert (0, 1) in combos or (1, 0) in combos


def test_num_pol_sky(tel):
    assert tel.num_pol_sky == 4
    assert list(tel.included_pol) == [0, 1, 2, 3]


def test_transfer_runs(tel):
    bts = tel.transfer_matrices(np.array([0]), np.array([0]))
    assert bts.shape[1] == 4
    assert np.isfinite(bts).all()


def test_noisepower_feedpairs(tel):
    npw = tel.noisepower_feedpairs(
        np.arange(3), np.arange(3), np.zeros(3, int), np.arange(3)
    )
    assert npw.shape == (3,)
    assert (npw > 0).all()
