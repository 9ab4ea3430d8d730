"""Engine vs dense complex128 referee across low m on the FULL bench BTM.

The pinned referee test (tests/test_dense_referee.py) checks m=12 on a
tiled-subset BTM at 2e-3.  scratch/whiten_localize.py showed ~4.6%
top-mode deviation at m=1 on the full BTM — quantify engine accuracy
per m and stage the comparison (evals from the engine vs scipy eigh of
the densely formed pencil from the engine's own returned beams).
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
import scipy.linalg as sla

import bench
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

for m in (0, 1, 2, 3, 5, 8, 12, 20, 40):
    mv = jnp.asarray(np.array([m], np.int32))
    br, bi = resident._build_beam_batch(
        pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
    )
    res = mstep.kl_product_step_split(
        br, bi, jnp.asarray(np.asarray(noisew), br.dtype),
        ls, lf, mv, npol=npol, nl=nl,
    )
    ev = np.sort(np.asarray(res.evals)[0])
    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
    bs = bs.reshape(F, -1, npol, nl)
    n = F * bs.shape[1]
    b = bs[:, :, 0, :].astype(np.complex128)
    S_d = np.einsum("fal,lfg,gbl->fagb", b, csl, b.conj(), optimize=True).reshape(n, n)
    N_d = np.einsum("fal,lfg,gbl->fagb", b, cnl, b.conj(), optimize=True).reshape(n, n)
    N_d = N_d + np.eye(n)
    S_d = 0.5 * (S_d + S_d.conj().T)
    N_d = 0.5 * (N_d + N_d.conj().T)
    w = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))
    k = int((w > CUT).sum())
    kk = max(k, 3)
    rel = np.abs(ev[-kk:] / w[-kk:] - 1)
    print(
        f"m={m:3d}: referee retains {k:3d}, top ref {w[-1]:.4e} "
        f"eng {ev[-1]:.4e}; max rel {rel.max():.2e} "
        f"(top-mode rel {abs(ev[-1]/w[-1]-1):.2e})"
    )
