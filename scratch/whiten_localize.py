"""Localize the solve/factored divergence on the full bench BTM, m<12,
then dense-referee the worst m."""
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
MS = list(range(12))

out = {}
for impl in ("solve", "factored", "refined"):
    prev = fpencil._WHITEN_IMPL
    fpencil._WHITEN_IMPL = impl
    try:
        evs = []
        for m in MS:
            mv = jnp.asarray(np.array([m], np.int32))
            br, bi = resident._build_beam_batch(
                pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
            )
            res = mstep.kl_product_step_split(
                br, bi, jnp.asarray(np.asarray(noisew), br.dtype),
                ls, lf, mv, npol=npol, nl=nl,
            )
            evs.append(np.sort(np.asarray(res.evals)[0]))
    finally:
        fpencil._WHITEN_IMPL = prev
    out[impl] = np.stack(evs)

worst_m, worst_rel = -1, 0.0
for i, m in enumerate(MS):
    a = out["solve"][i]
    ra = a > CUT
    denom = max(float(np.abs(a[ra]).max()), 1e-30) if ra.any() else 1.0
    line = f"m={m}: solve retains {ra.sum()}"
    for name in ("factored", "refined"):
        b = out[name][i]
        rb = b > CUT
        rel = float(np.abs((a - b)[ra]).max() / denom) if ra.any() else 0.0
        flag = "" if (ra == rb).all() else " SET-FLIP"
        line += f" | {name} {rb.sum()} rel {rel:.2e}{flag}"
        if name == "refined" and (rel > worst_rel or flag):
            worst_m, worst_rel = m, rel
    print(line)

print(f"\nworst m={worst_m} rel={worst_rel:.2e}; dense referee:")
mv = jnp.asarray(np.array([worst_m], np.int32))
br, bi = resident._build_beam_batch(
    pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
)
res = mstep.kl_product_step_split(
    br, bi, jnp.asarray(np.asarray(noisew), br.dtype), ls, lf, mv,
    npol=npol, nl=nl,
)
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
i = MS.index(worst_m)
k = int((w > CUT).sum())
kk = max(k, 3)
print(f"referee retains {k}; tail referee {w[-kk:]} ")
print(f"solve    tail {out['solve'][i][-kk:]}")
print(f"factored tail {out['factored'][i][-kk:]}")
