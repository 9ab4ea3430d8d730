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
out = {}
for mlo in (0, 8, 100, 200):
    mv = jnp.asarray(np.arange(mlo, mlo+8, dtype=np.int32))
    res = resident._resident_batch(
        pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
        npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
    bs = np.asarray(res.beam_re) + 1j*np.asarray(res.beam_im)
    F, S = bs.shape[1], bs.shape[2]
    for i in (0, 4):
        b4 = za.Z(jnp.asarray(bs[i].real.reshape(F,S,1,nl)), jnp.asarray(bs[i].imag.reshape(F,S,1,nl)))
        zs = fpencil.beam_factor(b4, lsj); zf = fpencil.beam_factor(b4, lfj)
        m = mlo + i
        out[f"as_{m}"] = (np.asarray(zs.re) + 1j*np.asarray(zs.im)).astype(np.complex64)
        out[f"af_{m}"] = (np.asarray(zf.re) + 1j*np.asarray(zf.im)).astype(np.complex64)
np.savez_compressed("/tmp/bench_factors.npz", **out)
print("saved", list(out))
