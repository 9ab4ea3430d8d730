import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.parallel import mstep, resident
from driftscan_tpu.ops import fpencil

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
print("btm ready", flush=True)

orig = fpencil.kl_solve
def patched(a_s, a_f, **kw):
    kw.update(fg_levels=3, sig_levels=2, band_rel=1e-3, solve_dtype=jnp.float64)
    return orig(a_s, a_f, **kw)
fpencil.kl_solve = patched

mv = jnp.asarray(np.arange(8, 16, dtype=np.int32))
f = functools.partial(resident._spectrum_batch, npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
st = time.time()
ev, nm = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
ev = np.asarray(ev)
print("f64 3/2 spectrum batch: compile+run %.1fs, finite=%s" % (time.time()-st, np.isfinite(ev).all()), flush=True)
best = np.inf
for _ in range(3):
    st = time.time()
    ev, nm = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    _ = float(np.asarray(ev).ravel()[0])
    best = min(best, time.time()-st)
print("steady: %.0f ms" % (best*1e3), flush=True)
st = time.time()
for s in range(0, tel.mmax+1, 8):
    ms = np.arange(s, min(s+8, tel.mmax+1))
    mvb = np.full(8, -1, np.int32); mvb[:len(ms)] = ms
    ev, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, jnp.asarray(mvb))
    assert np.isfinite(np.asarray(ev)).all(), s
print("full sweep OK: %.1fs" % (time.time()-st), flush=True)
