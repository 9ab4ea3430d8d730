import numpy as np
import pytest

from driftscan_tpu.core import telescope
from driftscan_tpu.ops import healpix, kernels, sht
from driftscan_tpu.telescope import cylinder

import jax.numpy as jnp


def _small_unpol(**kw):
    params = dict(
        num_freq=2,
        freq_start=400.0,
        freq_end=450.0,
        freq_mode="edge",
        num_cylinders=2,
        cylinder_width=5.0,
        num_feeds=3,
        feed_spacing=1.0,
        tsys=1.0,
    )
    params.update(kw)
    return cylinder.UnpolarisedCylinderTelescope.from_config(params)


def test_frequencies_edge_mode():
    tel = _small_unpol()
    # edge mode: centres offset by df/2
    df = 50.0 / 2
    np.testing.assert_allclose(tel.frequencies, [400 + df / 2, 425 + df / 2])
    assert tel.nfreq == 2
    assert np.all(tel.wavelengths > 0)


def test_frequencies_centre_mode():
    tel = _small_unpol(freq_mode="centre", num_freq=4)
    np.testing.assert_allclose(tel.frequencies, np.linspace(400, 450, 4, endpoint=False))


def test_feedpairs_unpolarised():
    tel = _small_unpol()
    assert tel.nfeed == 6
    # Unique baselines of a 2x3 grid (excluding autos, folding conjugates):
    # u in {0, w}, v in {-2..2} minus the u=0,v<=0 half -> counted explicitly
    assert tel.npairs == tel.baselines.shape[0]
    # All baselines point east or (u=0, v>0)
    bl = tel.baselines
    assert np.all((bl[:, 0] > 0) | ((bl[:, 0] == 0) & (bl[:, 1] > 0)))
    # Redundancy counts every included pair exactly once
    assert tel.redundancy.sum() == np.sum(
        np.logical_and(tel.feedmask, np.logical_not(tel.feedconj))
    )


def test_feedmap_consistency():
    tel = _small_unpol()
    fm, fmask, fconj = tel.feedmap, tel.feedmask, tel.feedconj
    up = tel.uniquepairs
    for k, (i, j) in enumerate(up):
        assert fm[i, j] == k
        assert not fconj[i, j]
        assert fconj[j, i]  # transpose is the conjugate pair


def test_in_cylinder_false_removes_u0():
    tel = _small_unpol(in_cylinder=False)
    assert np.all(tel.baselines[:, 0] != 0)


def test_lmax_mmax():
    tel = _small_unpol()
    lmax, mmax = telescope.max_lm(
        tel.baselines, tel.wavelengths.min(), tel.u_width, tel.v_width
    )
    assert tel.lmax == int(lmax.max())
    assert tel.mmax == int(mmax.max())
    assert tel.mmax <= tel.lmax


def test_noisepower_scaling():
    tel = _small_unpol()
    np1 = tel.noisepower(np.arange(tel.npairs), 0, ndays=100)
    np2 = tel.noisepower(np.arange(tel.npairs), 0, ndays=400)
    np.testing.assert_allclose(np1 / np2, 4.0)


@pytest.mark.slow
def test_transfer_matrices_forward_model():
    """The end-to-end physics check: project a random band-limited sky
    through the transfer matrices and compare with the direct numerical
    beam integral V(phi=0) = Int cvis(n) T(n) dOmega."""
    tel = _small_unpol(num_feeds=2, num_freq=1, accuracy_boost=1.5)
    fi = 0
    lside = tel.lmax

    bts = tel.transfer_matrices(np.arange(tel.npairs), np.full(tel.npairs, fi))
    assert bts.shape == (tel.npairs, 1, lside + 1, 2 * lside + 1)

    # Random band-limited real sky
    rng = np.random.default_rng(11)
    lmax_sky = min(8, lside)
    ls = np.arange(lside + 1)[:, None]
    ms = np.arange(lside + 1)[None, :]
    a_pos = rng.standard_normal((lside + 1, lside + 1)) + 1j * rng.standard_normal(
        (lside + 1, lside + 1)
    )
    a_pos = np.where((ms <= ls) & (ls <= lmax_sky), a_pos, 0)
    a_pos[:, 0] = a_pos[:, 0].real

    nside = tel._nside
    skymap = np.asarray(sht.synthesis_real(a_pos[None], nside))[0]

    # V_m from the packed transfer matrices: V(0) = sum_lm B_lm a_lm
    # (negative m of a real field: a_{l,-m} = (-1)^m conj(a_lm))
    for bi in range(tel.npairs):
        B = bts[bi, 0]
        vis_m = (B[:, : lside + 1] * a_pos).sum()
        for m in range(1, lside + 1):
            a_neg = (-1) ** m * np.conj(a_pos[:, m])
            vis_m += (B[:, -m] * a_neg).sum()

        # Direct integral of the visibility beam against the sky
        tel._init_trans(nside)
        # device beam maps live in the padded ring layout
        cvis = sht.unpad_map(
            np.asarray(tel._beam_map_batch([bi], [fi]))[0], nside
        )
        vis_direct = (cvis * skymap).sum() * 4 * np.pi / skymap.size

        assert np.abs(vis_m - vis_direct) < 1e-4 * max(np.abs(vis_direct), 1e-3)


def test_polarised_cylinder_transfer_shapes():
    params = dict(
        num_freq=1,
        freq_start=400.0,
        freq_end=450.0,
        freq_mode="edge",
        num_cylinders=1,
        cylinder_width=5.0,
        num_feeds=2,
        feed_spacing=1.0,
    )
    tel = cylinder.PolarisedCylinderTelescope.from_config(params)
    assert tel.num_pol_sky == 4
    assert tel.nfeed == 4  # X and Y
    bts = tel.transfer_matrices(np.array([0]), np.array([0]))
    assert bts.shape == (1, 4, tel.lmax + 1, 2 * tel.lmax + 1)
    assert np.isfinite(bts).all()
    # Stokes-I part must be non-trivial
    assert np.abs(bts[0, 0]).max() > 0


def test_polarised_skip_pol():
    params = dict(
        num_freq=1,
        freq_start=400.0,
        freq_end=450.0,
        freq_mode="edge",
        num_cylinders=1,
        cylinder_width=5.0,
        num_feeds=2,
        feed_spacing=1.0,
        skip_pol=True,
    )
    tel = cylinder.PolarisedCylinderTelescope.from_config(params)
    assert list(tel.included_pol) == [0]
    bts = tel.transfer_matrices(np.array([0]), np.array([0]))
    assert np.abs(bts[0, 0]).max() > 0
    assert np.abs(bts[0, 1:]).max() == 0.0


def test_pickle_roundtrip():
    import pickle

    tel = _small_unpol()
    tel.calculate_feedpairs()
    tel._init_trans(16)
    data = pickle.dumps(tel)
    tel2 = pickle.loads(data)
    assert tel2._nside is None  # underscore state stripped
    np.testing.assert_allclose(tel2.baselines, tel.baselines)
    assert tel2.num_feeds == tel.num_feeds


class TestOldCylinder:
    """The legacy (sinc-beam) cylinder models must run the full transfer
    pipeline (reference: /root/reference/drift/telescope/oldcylinder.py)."""

    def test_unpolarised_transfer(self):
        from driftscan_tpu.telescope import oldcylinder

        tel = oldcylinder.UnpolarisedCylinderTelescope.from_config(
            dict(num_freq=1, freq_start=100.0, freq_end=110.0, freq_mode="edge",
                 num_cylinders=2, cylinder_width=2.0, num_feeds=2,
                 feed_spacing=1.5)
        )
        t = np.asarray(tel.transfer_matrices(np.arange(tel.npairs),
                                             np.zeros(tel.npairs, int)))
        assert t.shape[1] == 1  # unpolarised
        assert np.isfinite(t).all()
        assert np.abs(t).max() > 0

    @pytest.mark.parametrize("ortho", [True, False])
    def test_polarised_beams(self, ortho):
        from driftscan_tpu.telescope import oldcylinder

        tel = oldcylinder.PolarisedCylinderTelescope.from_config(
            dict(num_freq=1, freq_start=100.0, freq_end=110.0, freq_mode="edge",
                 num_cylinders=1, cylinder_width=2.0, num_feeds=2,
                 feed_spacing=1.5, ortho_pol=ortho)
        )
        nside = tel._nside_for(16)
        tel._init_trans(nside)
        bx = tel.beamx(0, 0)
        by = tel.beamy(0, 0)
        assert bx.shape == by.shape == (12 * nside**2, 2)
        # orthogonal dipoles: X along phi-hat, Y along theta-hat
        if ortho:
            assert np.abs(bx[:, 0]).max() == 0
            assert np.abs(by[:, 1]).max() == 0
        assert np.isfinite(bx).all() and np.isfinite(by).all()


class TestChannelSelection:
    """channel_bin / channel_range / channel_list semantics.

    Mirrors ref drift/core/telescope.py:158-168 (docs) and :404-430
    (implementation); channel_list is NotImplementedError in the
    reference but supported here.
    """

    def _freqs(self, **kw):
        return _small_unpol(freq_mode="centre", num_freq=8, **kw).frequencies

    def test_channel_bin(self):
        full = np.linspace(400, 450, 8, endpoint=False)
        np.testing.assert_allclose(
            self._freqs(channel_bin=2), full.reshape(-1, 2).mean(axis=1)
        )

    def test_channel_bin_must_divide(self):
        with pytest.raises(ValueError):
            self._freqs(channel_bin=3)

    def test_channel_range_forms(self):
        full = np.linspace(400, 450, 8, endpoint=False)
        np.testing.assert_allclose(self._freqs(channel_range=[2, 6]), full[2:6])
        np.testing.assert_allclose(self._freqs(channel_range=[5]), full[:5])
        np.testing.assert_allclose(
            self._freqs(channel_range=[1, 8, 2]), full[1:8:2]
        )

    def test_channel_list_sparse(self):
        full = np.linspace(400, 450, 8, endpoint=False)
        np.testing.assert_allclose(
            self._freqs(channel_list=[0, 3, 7]), full[[0, 3, 7]]
        )

    def test_channel_list_priority_over_range(self):
        full = np.linspace(400, 450, 8, endpoint=False)
        np.testing.assert_allclose(
            self._freqs(channel_list=[1, 4], channel_range=[0, 2]), full[[1, 4]]
        )

    def test_channel_list_bounds(self):
        with pytest.raises(ValueError):
            self._freqs(channel_list=[0, 8])

    def test_channel_list_after_binning(self):
        full = np.linspace(400, 450, 8, endpoint=False).reshape(-1, 2).mean(axis=1)
        np.testing.assert_allclose(
            self._freqs(channel_bin=2, channel_list=[0, 3]), full[[0, 3]]
        )

    def test_channel_list_products(self, tmp_path):
        """Sparse channel selection flows through product generation."""
        from driftscan_tpu.core import beamtransfer
        from driftscan_tpu.telescope import cylinder

        tel = cylinder.UnpolarisedCylinderTelescope.from_config(
            dict(
                num_freq=4,
                freq_start=100.0,
                freq_end=110.0,
                freq_mode="edge",
                num_cylinders=1,
                cylinder_width=2.0,
                num_feeds=2,
                feed_spacing=1.5,
                tsys=50.0,
                channel_list=[0, 2, 3],
            )
        )
        assert tel.nfreq == 3
        bt = beamtransfer.BeamTransfer(str(tmp_path / "bt"), telescope=tel)
        bt.generate()
        beam = bt.beam_m(1)
        assert beam.shape[0] == 3  # nfreq axis follows the selection
        assert np.isfinite(beam).all()


class TestNsideCap:
    """DRIFTSCAN_TPU_NSIDE_CAP clamps the boosted nside but never below
    the un-boosted adequacy criterion 2*nside >= lmax."""

    def _tel(self):
        from driftscan_tpu.telescope import cylinder

        return cylinder.UnpolarisedCylinderTelescope.from_config(
            dict(num_freq=1, freq_start=400.0, freq_end=410.0,
                 freq_mode="edge", num_cylinders=1, cylinder_width=2.0,
                 num_feeds=2, feed_spacing=1.5)
        )

    def test_cap_off_is_identity(self, monkeypatch):
        monkeypatch.delenv("DRIFTSCAN_TPU_NSIDE_CAP", raising=False)
        tel = self._tel()
        from driftscan_tpu.ops import healpix

        for lm in (64, 1006, 1035):
            assert tel._nside_for(lm) == healpix.nside_for_lmax(
                lm, accuracy_boost=tel.accuracy_boost
            )

    def test_cap_clamps_boost_only(self, monkeypatch):
        monkeypatch.setenv("DRIFTSCAN_TPU_NSIDE_CAP", "1024")
        tel = self._tel()
        # lmax 1035: boosted pick is 2048; cap brings it to 1024, which
        # still satisfies 2*nside >= lmax
        assert tel._nside_for(1035) == 1024
        assert 2 * 1024 >= 1035
        # below the cap nothing changes
        assert tel._nside_for(64) == 64
        # the cap never goes below the un-boosted floor
        monkeypatch.setenv("DRIFTSCAN_TPU_NSIDE_CAP", "256")
        assert tel._nside_for(1035) == 1024  # floor wins over the cap
