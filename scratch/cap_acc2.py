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
    st = time.time()
    ev, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    ev = np.asarray(ev); tc = time.time()-st
    best = np.inf
    for _ in range(2):
        st = time.time(); ev2, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
        _ = float(np.asarray(ev2).ravel()[0]); best = min(best, time.time()-st)
    return ev, best

e, t0 = run()
print(f"exact steady {t0*1e3:.0f} ms", flush=True)
for kc in (128, 160):
    c, t = run(fg_k_cap=kc, sig_k_cap=kc, fg_levels=10, sig_levels=6)
    bias = []
    for i in range(8):
        te = np.sort(e[i])[::-1][:5]; tc_ = np.sort(c[i])[::-1][:5]
        bias.append((tc_/te - 1))
    bias = np.array(bias)
    print(f"k={kc}: steady {t*1e3:.0f} ms, top-5 bias mean {bias.mean():+.3f} max {np.abs(bias).max():.3f}", flush=True)
