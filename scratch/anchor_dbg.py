import sys, functools
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
ev_engine = np.asarray(res.evals)
bs = np.asarray(res.beam_re) + 1j*np.asarray(res.beam_im)
F, S = bs.shape[1], bs.shape[2]

i = 0
b4 = za.Z(jnp.asarray(bs[i].real.reshape(F,S,1,nl)), jnp.asarray(bs[i].imag.reshape(F,S,1,nl)))
a_s = np.asarray(fpencil.beam_factor(b4, lsj).re) + 1j*np.asarray(fpencil.beam_factor(b4, lsj).im)
a_f = np.asarray(fpencil.beam_factor(b4, lfj).re) + 1j*np.asarray(fpencil.beam_factor(b4, lfj).im)
print("a_s norm", np.abs(a_s).max(), "a_f norm", np.abs(a_f).max(), flush=True)
evd, _ = fpencil.kl_solve_dense_ref(a_s, a_f)
e = np.sort(evd)[::-1]; c = np.sort(ev_engine[i].astype(np.float64))[::-1]
print("anchor top10:", e[:10], flush=True)
print("engine top10:", c[:10], flush=True)
print("ratio:", (c[:10]/e[:10]), flush=True)

# also: engine kl_solve (device) on the very same a_s/a_f
kl = fpencil.kl_solve(za.Z(jnp.asarray(np.ascontiguousarray(a_s.real)), jnp.asarray(np.ascontiguousarray(a_s.imag))),
                      za.Z(jnp.asarray(np.ascontiguousarray(a_f.real)), jnp.asarray(np.ascontiguousarray(a_f.imag))))
c2 = np.sort(np.asarray(kl.evals, dtype=np.float64))[::-1]
print("kl_solve(same A) top10:", c2[:10], flush=True)
