import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.parallel import mstep, resident
from driftscan_tpu.ops import fpencil, zarray as za

tel = bench.build_telescope()
cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
pos, neg = resident.btm_resident(tel, blg, fig)
nl = tel.lmax + 1
nw = jnp.asarray(noisew, dtype=pos.re.dtype)
lsj = jnp.asarray(ls, dtype=pos.re.dtype)
lfj = jnp.asarray(lf, dtype=pos.re.dtype)
mv = jnp.asarray(np.arange(8, 16, dtype=np.int32))
res = resident._resident_batch(
    pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
    npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
bs = np.asarray(res.beam_re) + 1j*np.asarray(res.beam_im)
F, S = bs.shape[1], bs.shape[2]
i = 0
b4 = za.Z(jnp.asarray(bs[i].real.reshape(F,S,1,nl)), jnp.asarray(bs[i].imag.reshape(F,S,1,nl)))
zs = fpencil.beam_factor(b4, lsj); zf = fpencil.beam_factor(b4, lfj)
a_s = (np.asarray(zs.re) + 1j*np.asarray(zs.im)).astype(np.complex128)
a_f = (np.asarray(zf.re) + 1j*np.asarray(zf.im)).astype(np.complex128)
print("a_s max", np.abs(a_s).max(), "a_f max", np.abs(a_f).max(), "n,K:", a_s.shape, a_f.shape, flush=True)

kl = fpencil.kl_solve(za.Z(jnp.asarray(np.ascontiguousarray(a_s.real).astype(np.float32)), jnp.asarray(np.ascontiguousarray(a_s.imag).astype(np.float32))),
                      za.Z(jnp.asarray(np.ascontiguousarray(a_f.real).astype(np.float32)), jnp.asarray(np.ascontiguousarray(a_f.imag).astype(np.float32))))
evs = np.asarray(kl.evals, dtype=np.float64)
vecs = (np.asarray(kl.evecs.re) + 1j*np.asarray(kl.evecs.im)).astype(np.complex128)
Smat = a_s @ a_s.conj().T
Nmat = a_f @ a_f.conj().T + np.eye(a_s.shape[0])
for j in (-1, -2, -3):
    v = vecs[:, j]
    rho = float(np.real(v.conj() @ Smat @ v) / np.real(v.conj() @ Nmat @ v))
    print(f"engine eval {evs[j]:.4f} -> f64 Rayleigh quotient {rho:.6f}", flush=True)
# and dense top
evd, vd = fpencil.kl_solve_dense_ref(a_s, a_f)
print("dense top3:", evd[-3:], flush=True)
v = vd[:, -1]
rho = float(np.real(v.conj() @ Smat @ v) / np.real(v.conj() @ Nmat @ v))
print(f"dense top evec RQ check: {rho:.6f}", flush=True)
