"""Dense complex128 referee for the bench-scale KL spectrum.

Round-3 forensic: the round-1 engine returned top eigenvalues ~28x
below the truth at bench-scale conditioning (its 30.985 m-modes/s
headline was benchmarking a broken solve); the round-2+ factored
pencil matches the dense complex128 generalised eigensolve — the
reference algorithm (/root/reference/drift/core/kltransform.py:258-341)
— to ~2e-4 on the retained modes.  This pins that equivalence at bench
scale as a regression anchor: the product step's own prewhitened,
svcut-masked bsvd is projected through the raw C_l tables and the dense
pencil is solved with scipy in complex128.

Runs the split-complex f32 engine (the chip path) on the CPU backend;
slow tier (~3 min: resident BTM subset + one dense eigh).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_engine_matches_dense_referee_at_bench_scale():
    import jax
    import jax.numpy as jnp
    import scipy.linalg as sla

    import bench
    from driftscan_tpu.parallel import mstep, resident

    tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)

    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    # strided unit subset tiled back to full size: the KL pencil sees
    # full-dimension inputs without paying the full CPU BTM
    stride = int(np.ceil(len(blg) / 12))
    pos, neg = resident.btm_resident(tel, blg[::stride], fig[::stride])
    idx = np.arange(len(blg)) % pos.re.shape[0]
    pos = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pos)
    neg = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), neg)

    nl = tel.lmax + 1
    npol = tel.num_pol_sky
    F = tel.nfreq
    assert npol == 1  # referee contraction below is unpolarised
    mv = jnp.asarray(np.array([12], np.int32))

    beams_re, beams_im = resident._build_beam_batch(
        pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
    )
    res = mstep.kl_product_step_split(
        beams_re,
        beams_im,
        jnp.asarray(np.asarray(noisew), beams_re.dtype),
        ls,
        lf,
        mv,
        npol=npol,
        nl=nl,
    )
    ev_engine = np.sort(np.asarray(res.evals)[0])

    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
    bs = bs.reshape(F, -1, npol, nl)
    S_ = bs.shape[1]
    n = F * S_
    csl = np.asarray(cl_s, np.float64).reshape(nl, F, F)
    cnl = np.asarray(cl_n, np.float64).reshape(nl, F, F)
    b = bs[:, :, 0, :].astype(np.complex128)
    S_d = np.einsum("fal,lfg,gbl->fagb", b, csl, b.conj(), optimize=True)
    N_d = np.einsum("fal,lfg,gbl->fagb", b, cnl, b.conj(), optimize=True)
    S_d = S_d.reshape(n, n)
    N_d = N_d.reshape(n, n) + np.eye(n)
    S_d = 0.5 * (S_d + S_d.conj().T)
    N_d = 0.5 * (N_d + N_d.conj().T)
    w = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))

    # retained modes (eval > 0.1 scale: here compare everything above
    # 1e-3 of the top, the band the subset cut can ever touch)
    top = w[-1]
    sel = w > 1e-3 * top
    k = int(sel.sum())
    assert k >= 3
    np.testing.assert_allclose(ev_engine[-k:], w[-k:], rtol=2e-3)
    # and the top mode is nowhere near the r01 failure (28x low)
    assert ev_engine[-1] > 0.5 * top
