"""Diagnose the low-m engine underestimate: QR impl / rounds / factor width.

Runs m in {0,1,2,3,5} through kl_product_step_split under (a) default
shifted CholeskyQR, (b) Householder QR, and compares to the dense
complex128 referee formed from the engine's own beams.
"""
import os, sys
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
bl, fi = np.arange(tel.npairs), np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
pos, neg = resident.btm_resident(tel, blg, fig)

nl, npol, F = tel.lmax + 1, tel.num_pol_sky, tel.nfreq
CUT = 0.1
csl = np.asarray(cl_s, np.float64).reshape(nl, F, F)
cnl = np.asarray(cl_n, np.float64).reshape(nl, F, F)

MS = (0, 1, 2, 3, 5)

def engine_evals(m):
    mv = jnp.asarray(np.array([m], np.int32))
    br, bi = resident._build_beam_batch(
        pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
    )
    res = mstep.kl_product_step_split(
        br, bi, jnp.asarray(np.asarray(noisew), br.dtype),
        ls, lf, mv, npol=npol, nl=nl,
    )
    return np.sort(np.asarray(res.evals)[0]), res

refs = {}
for m in MS:
    ev, res = engine_evals(m)
    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
    bs = bs.reshape(F, -1, npol, nl)
    n = F * bs.shape[1]
    b = bs[:, :, 0, :].astype(np.complex128)
    S_d = np.einsum("fal,lfg,gbl->fagb", b, csl, b.conj(), optimize=True).reshape(n, n)
    N_d = np.einsum("fal,lfg,gbl->fagb", b, cnl, b.conj(), optimize=True).reshape(n, n)
    N_d = N_d + np.eye(n)
    S_d = 0.5 * (S_d + S_d.conj().T)
    N_d = 0.5 * (N_d + N_d.conj().T)
    refs[m] = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))

import itertools
for impl, rounds in (("cholqr_split", None), ("cholqr_split", 12),
                     ("cholqr_split", 16), ("cholqr", 12)):
    prev = fpencil._QR_IMPL
    prev_r = fpencil._cholqr_rounds
    fpencil._QR_IMPL = impl
    if rounds:
        fpencil._cholqr_rounds = lambda dt, r=rounds: r
    try:
        mstep.kl_product_step_split.clear_cache() if hasattr(
            mstep.kl_product_step_split, "clear_cache"
        ) else None
        for m in MS:
            ev, _ = engine_evals(m)
            w = refs[m]
            k = max(int((w > CUT).sum()), 3)
            rel = np.abs(ev[-k:] / w[-k:] - 1)
            print(
                f"qr={impl:12s} r={rounds}: m={m}: top rel {abs(ev[-1]/w[-1]-1):.2e} "
                f"max rel {rel.max():.2e}"
            )
    finally:
        fpencil._QR_IMPL = prev
        fpencil._cholqr_rounds = prev_r
