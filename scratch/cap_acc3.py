import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.parallel import mstep, resident

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

def run(**kw):
    f = functools.partial(resident._spectrum_batch, npairs=tel.npairs,
                          nfreq=tel.nfreq, nl=nl, **kw)
    ev, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    return np.asarray(ev)

e = run()
for tag, kw in [
    ("fg-capped only", dict(fg_k_cap=128, fg_levels=10)),
    ("sig-capped only", dict(sig_k_cap=128, sig_levels=6)),
]:
    c = run(**kw)
    bias = np.array([(np.sort(c[i])[::-1][:5] / np.sort(e[i])[::-1][:5] - 1) for i in range(8)])
    print(f"{tag}: top-5 bias mean {bias.mean():+.4f} max {np.abs(bias).max():.4f}", flush=True)
