"""Which whitening application is right near the cut? Dense referee check.

Reuses the dense-referee plumbing (tests/test_dense_referee.py) on the
real bench pencil at a few m's, comparing the solve-path and the
factored-path retained spectra against the complex128 generalised
eigensolve, over every mode above the 0.1 cut.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import scipy.linalg as sla

import bench
from driftscan_tpu.ops import fpencil
from driftscan_tpu.parallel import mstep, resident

tel = bench.build_telescope()
cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)

bl = np.arange(tel.npairs)
fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
stride = int(np.ceil(len(blg) / 12))
pos, neg = resident.btm_resident(tel, blg[::stride], fig[::stride])
idx = np.arange(len(blg)) % pos.re.shape[0]
pos = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pos)
neg = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), neg)

nl = tel.lmax + 1
npol = tel.num_pol_sky
F = tel.nfreq
CUT = 0.1

for m in (2, 12, 60, 150):
    mv = jnp.asarray(np.array([m], np.int32))
    beams_re, beams_im = resident._build_beam_batch(
        pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
    )
    evs = {}
    for impl in ("solve", "factored"):
        prev = fpencil._WHITEN_IMPL
        fpencil._WHITEN_IMPL = impl
        try:
            res = mstep.kl_product_step_split(
                beams_re, beams_im,
                jnp.asarray(np.asarray(noisew), beams_re.dtype),
                ls, lf, mv, npol=npol, nl=nl,
            )
        finally:
            fpencil._WHITEN_IMPL = prev
        evs[impl] = np.sort(np.asarray(res.evals)[0])
    # complex128 dense referee (unpolarised contraction)
    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
    bs = bs.reshape(F, -1, npol, nl)
    n = F * bs.shape[1]
    csl = np.asarray(cl_s, np.float64).reshape(nl, F, F)
    cnl = np.asarray(cl_n, np.float64).reshape(nl, F, F)
    b = bs[:, :, 0, :].astype(np.complex128)
    S_d = np.einsum("fal,lfg,gbl->fagb", b, csl, b.conj(), optimize=True).reshape(n, n)
    N_d = np.einsum("fal,lfg,gbl->fagb", b, cnl, b.conj(), optimize=True).reshape(n, n)
    N_d = N_d + np.eye(n)
    S_d = 0.5 * (S_d + S_d.conj().T)
    N_d = 0.5 * (N_d + N_d.conj().T)
    w = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))

    ret = w > CUT
    k = int(ret.sum())
    print(f"m={m}: referee retains {k} (top {w[-1]:.3e})")
    for impl in ("solve", "factored"):
        e = evs[impl]
        kk = int((e > CUT).sum())
        rel = np.abs(e[-k:] / w[-k:] - 1).max() if k else 0.0
        relmax = np.abs(e[-k:] / w[-k:] - 1) if k else []
        worst = (
            int(np.argmax(relmax)) if k else -1
        )
        print(
            f"  {impl:9s} retains {kk}; max rel over referee-retained "
            f"{rel:.2e} (worst at idx {worst} of {k}, "
            f"ref {w[-k:][worst]:.3e} got {e[-k:][worst]:.3e})"
        )
