"""Concrete instrument models: GMRT, focal-plane array, dish array.

These cover the instrument behaviours the reference encodes:
GMRT's real 30-dish layout with a 600 m baseline cut
(/root/reference/drift/telescope/gmrt.py), the focal-plane array's
beams-only uniqueness (/root/reference/drift/telescope/focalplane.py:133),
and the dish array's jinc (Airy) beam
(/root/reference/drift/telescope/disharray.py).
"""

import numpy as np
import pytest

from driftscan_tpu.telescope import disharray, focalplane, gmrt


class TestGmrt:
    def test_layout(self):
        t = gmrt.GmrtUnpolarised.from_config({"num_freq": 2})
        # the real 30-dish array, shipped as package data
        assert t.feedpositions.shape == (30, 2)
        assert t.tsys_flat == 582.0
        assert np.isclose(np.degrees(np.pi / 2 - t.zenith[0]), 19.09)

    def test_baseline_cut(self):
        t = gmrt.GmrtUnpolarised.from_config({"num_freq": 2})
        lengths = np.hypot(*t.baselines.T)
        assert lengths.max() <= 600.0
        # the full 30-dish array has 435 pairs; the 600 m cut removes most
        assert 0 < t.npairs < 435

    def test_gaussian_beam_normalised_peak(self):
        t = gmrt.GmrtUnpolarised.from_config({"num_freq": 2})
        t._init_trans(t._nside_for(64))
        b = np.asarray(t.beam(0, 0))
        assert b.shape == (t._angpos.shape[0],)
        # peak at the pointing, positive, finite
        assert np.isfinite(b).all()
        assert b.max() > 0.99 * np.abs(b).max()


class TestFocalPlane:
    def _make(self, **kw):
        conf = dict(
            num_freq=2,
            freq_start=400.0,
            freq_end=420.0,
            beam_num_u=3,
            beam_num_v=2,
            beam_spacing_u=1.0,
            beam_spacing_v=1.0,
            beam_size=1.0,
            auto_correlations=True,
        )
        conf.update(kw)
        return focalplane.FocalPlaneArray.from_config(conf)

    def test_pointing_grid(self):
        t = self._make()
        p = t.beam_pointings
        assert p.shape == (6, 2)
        # centred on the zenith
        np.testing.assert_allclose(p[:, 0].mean(), t.zenith[0], atol=1e-12)
        np.testing.assert_allclose(p[:, 1].mean(), t.zenith[1], atol=1e-12)

    def test_beams_only_uniqueness(self):
        """Each beam auto-correlates with itself: nfeed unique 'pairs',
        all zero-length baselines."""
        t = self._make()
        assert t.npairs == 6
        np.testing.assert_allclose(t.baselines, 0.0, atol=1e-12)
        # feedmap pairs feed i with itself
        for i in range(6):
            fi, fj = t.uniquepairs[i]
            assert fi == fj

    @pytest.mark.slow
    def test_square_vs_gaussian_beam(self):
        tg = self._make(square_beam=False)
        ts = self._make(square_beam=True)
        nside = tg._nside_for(int(tg.lmax * tg.l_boost))
        tg._init_trans(nside)
        ts._init_trans(nside)
        bg = np.asarray(tg.beam(0, 0))
        bs = np.asarray(ts.beam(0, 0))
        # square beam is a hard mask; Gaussian is smooth
        assert set(np.round(np.unique(bs), 12)) <= {0.0, 1.0}
        assert len(np.unique(np.round(bg, 6))) > 10


class TestDishArray:
    def test_jinc_beam_and_grid(self):
        t = disharray.DishArray.from_config(
            dict(num_freq=2, freq_lower=400.0, freq_upper=420.0)
        )
        # grid of dishes (unpolarised jinc beams)
        assert t._single_feedpositions.shape[1] == 2
        t._init_trans(t._nside_for(int(t.lmax * t.l_boost)))
        b = np.asarray(t.beam(0, 0))
        assert b.shape == (t._angpos.shape[0],)
        assert np.isfinite(b).all()
        # Airy pattern: peak towards zenith
        zd = np.abs(t._angpos[:, 0] - t.zenith[0])
        amp = np.abs(b)
        assert amp[np.argmin(zd)] > 0.5 * amp.max()


def test_focalplane_products_nosvd(tmp_path):
    """End-to-end products for a focal-plane array under NoSVD.

    Regression: the batched KL path assumed the standard BeamTransfer
    layout/prewhitening and crashed on BeamTransferNoSVD (whose beams
    live in the telescope basis, un-prewhitened) — it must gate to the
    per-m transform instead (beamtransfer.kl_mbatch_ok).
    """
    import h5py

    from driftscan_tpu.core import beamtransfer, manager

    conf = {
        "config": {
            "beamtransfers": True,
            "kltransform": True,
            "psfisher": False,
            "output_directory": str(tmp_path / "prod"),
            "nosvd": True,
        },
        "telescope": {
            "type": "FocalPlane",
            "num_freq": 2,
            "freq_start": 400.0,
            "freq_end": 410.0,
            "beam_num_u": 2,
            "beam_num_v": 1,
            "beam_spacing_u": 3.0,
            "beam_spacing_v": 3.0,
            "beam_size": 6.0,
            "auto_correlations": True,
        },
        "kltransform": [{"type": "KLTransform", "name": "kl"}],
    }
    m = manager.ProductManager()
    m.apply_config(conf)
    assert isinstance(m.beamtransfer, beamtransfer.BeamTransferNoSVD)
    assert not m.beamtransfer.kl_mbatch_ok
    m.generate()
    with h5py.File(f"{tmp_path}/prod/bt/kl/evals.hdf5") as f:
        ev = f["evals"][:]
    assert np.isfinite(ev).all()
