"""Polarised m-window referee: ns1's actual path against dense f64.

tests/test_window_referee.py pins the windowed product path
unpolarised; the scale-axis north-star (scratch/northstar.py) runs
npol=4, where the triple-SVD additionally filters pure-polarisation
modes and the pol-diagonal C_l blocks ([0,0] TT+point sources,
[1,1]/[2,2] polarised synchrotron) enter the pencil.  This test:

  1. windowed == full-range `_spectrum_batch` at npol=4 (the layout
     every ns1 window used),
  2. engine evals match a dense complex128 generalised eigensolve
     built from the step's own SVD-basis beams with the pol-summed
     contraction  S = sum_p  B_p C_l^{pp} B_p^H
     (reference algorithm /root/reference/drift/core/kltransform.py:
     258-341; pol-diagonal blocks per skymodel.py:20-68).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_polarised_windowed_product_matches_dense():
    import jax.numpy as jnp
    import scipy.linalg as sla

    import bench
    from driftscan_tpu.parallel import mstep, resident
    from driftscan_tpu.telescope import cylinder

    M = 10
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=4, freq_start=400.0, freq_end=800.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=3.0, num_feeds=1,
        feed_spacing=6.0, tsys=50.0, single_precision=True,
    ))
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    nl = tel.lmax + 1
    npol = tel.num_pol_sky
    F = tel.nfreq
    assert npol == 4

    posf, negf = resident.btm_resident(tel, blg, fig)
    posw, negw = resident.btm_resident(tel, blg, fig, m_range=(M, M + 1))

    nw = jnp.asarray(np.asarray(noisew), posf.re.dtype)
    mv = jnp.asarray(np.array([M], np.int32))

    # 1. windowed == full-range
    evA, _, _ = resident._spectrum_batch(
        posf.re, posf.im, negf.re, negf.im, nw, ls, lf, mv,
        npairs=tel.npairs, nfreq=F, nl=nl, npol=npol, sig_levels=2,
    )
    evB, _, _ = resident._spectrum_batch(
        posw.re, posw.im, negw.re, negw.im, nw, ls, lf, mv,
        npairs=tel.npairs, nfreq=F, nl=nl, npol=npol, sig_levels=2,
        m_lo=np.int32(M),
    )
    evA = np.sort(np.asarray(evA)[0])
    evB = np.sort(np.asarray(evB)[0])
    np.testing.assert_allclose(evB, evA, rtol=1e-6, atol=1e-12)

    # 2. dense complex128 referee from the step's SVD-basis beams
    beams_re, beams_im = resident._build_beam_batch(
        posf.re, posf.im, negf.re, negf.im, mv, tel.npairs, F, npol, nl
    )
    res = mstep.kl_product_step_split(
        beams_re, beams_im, nw, ls, lf, mv, npol=npol, nl=nl,
    )
    ev_engine = np.sort(np.asarray(res.evals)[0])

    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
    bs = bs.reshape(F, -1, npol, nl)
    S_ = bs.shape[1]
    n = F * S_
    csl = np.asarray(cl_s, np.float64)  # (npol, npol, nl, F, F)
    cnl = np.asarray(cl_n, np.float64)
    b = bs.astype(np.complex128)  # (F, S_, npol, nl)
    S_d = np.zeros((F, S_, F, S_), np.complex128)
    N_d = np.zeros((F, S_, F, S_), np.complex128)
    for p in range(npol):
        for q in range(npol):
            if not np.any(csl[p, q]) and not np.any(cnl[p, q]):
                continue
            S_d += np.einsum(
                "fal,lfg,gbl->fagb", b[:, :, p], csl[p, q], b[:, :, q].conj(),
                optimize=True,
            )
            N_d += np.einsum(
                "fal,lfg,gbl->fagb", b[:, :, p], cnl[p, q], b[:, :, q].conj(),
                optimize=True,
            )
    S_d = S_d.reshape(n, n)
    N_d = N_d.reshape(n, n) + np.eye(n)
    S_d = 0.5 * (S_d + S_d.conj().T)
    N_d = 0.5 * (N_d + N_d.conj().T)
    w = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))

    top = w[-1]
    sel = w > 1e-3 * top
    k = int(sel.sum())
    assert k >= 2
    np.testing.assert_allclose(ev_engine[-k:], w[-k:], rtol=2e-3)
