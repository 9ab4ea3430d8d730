"""Split-complex triple SVD on *real polarised beams* must match native.

Regression for a product-scale failure: the split path's polarisation
nullspace (SVD2) was built from the small-eigenvalue columns of a single
f32 Gram eigh — those columns mix the true null space with
already-resolved polarised directions (the deflated Gram is numerically
singular along them), which inflated retained SVD spectra by tens of
percent on the real PolarisedCylinder beams while all synthetic
small-matrix tests passed.  The fixed path rejects the resolved
polarised directions by explicit projection (ops/linalg.py SVD2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from driftscan_tpu.ops import linalg
from driftscan_tpu.telescope import cylinder


@pytest.fixture(scope="module")
def pol_beams():
    """Noise-weighted m-major beam matrices of a real polarised cylinder."""
    tel = cylinder.PolarisedCylinderTelescope.from_config(
        dict(
            num_freq=4,
            freq_start=100.0,
            freq_end=110.0,
            freq_mode="edge",
            num_cylinders=2,
            cylinder_width=2.0,
            num_feeds=2,
            feed_spacing=1.5,
            tsys=1.0,
            single_precision=True,
        )
    )
    bl = np.arange(tel.npairs)
    fi = np.zeros_like(bl)
    tar = np.asarray(tel.transfer_matrices(bl, fi))
    nl = tel.lmax + 1
    nw = np.concatenate(
        [tel.noisepower(np.arange(tel.npairs), 0).flatten() ** -0.5] * 2
    )
    t5 = tar.reshape(tel.npairs, 4, nl, -1)
    beams = {}
    for mi in (1, 2, 3, 5):
        p = t5[..., mi]
        n = (-1) ** mi * np.conj(t5[..., -mi])
        bfm = np.concatenate([p, n], axis=0).reshape(2 * tel.npairs, 4 * nl)
        beams[mi] = (bfm * nw[:, None]).astype(np.complex128)
    return beams, nl


def test_split_triple_svd_matches_native_on_real_beams(pol_beams):
    beams, nl = pol_beams
    for mi, bfm in beams.items():
        _, _, sig_n, nm_n = linalg.triple_svd_batched(
            jnp.asarray(bfm[None]), npol=4, nl=nl, polsvcut=1e-4
        )
        r = linalg.triple_svd_split_batched(
            jnp.asarray(bfm.real[None], jnp.float32),
            jnp.asarray(bfm.imag[None], jnp.float32),
            npol=4,
            nl=nl,
            polsvcut=1e-4,
        )
        s_n = np.sort(np.asarray(sig_n[0]))[::-1]
        s_s = np.sort(np.asarray(r[4][0]))[::-1]

        # dominant retained singular values match at the f32 tier
        big = s_n > s_n.max() * 1e-3
        np.testing.assert_allclose(
            s_s[big], s_n[big], rtol=2e-3, err_msg=f"m={mi}"
        )
        # no large spurious modes where the native path has none
        extra = s_s[~big]
        assert (extra < s_n.max() * 1e-3).all(), f"m={mi}: {extra[:3]}"
