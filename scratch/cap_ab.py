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
print("btm ready", flush=True)

def sweep(tag, **kw):
    f = functools.partial(resident._spectrum_batch, npairs=tel.npairs,
                          nfreq=tel.nfreq, nl=nl, **kw)
    mv = jnp.asarray(np.arange(8, 16, dtype=np.int32))
    st = time.time()
    ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    ev0 = np.asarray(ev)
    tc = time.time() - st
    best = np.inf
    for _ in range(3):
        st = time.time()
        ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
        _ = float(np.asarray(ev).ravel()[0])
        best = min(best, time.time() - st)
    print(f"{tag}: compile {tc:.1f}s steady {best*1e3:.0f} ms, finite={np.isfinite(ev0).all()}", flush=True)
    return ev0

ev_exact = sweep("exact (8,5)")
for kc, fgl, sgl in [(64, 10, 6), (96, 10, 6), (64, 8, 5)]:
    ev_c = sweep(f"cap k={kc} ({fgl},{sgl})", fg_k_cap=kc, sig_k_cap=kc,
                 fg_levels=fgl, sig_levels=sgl)
    # accuracy vs exact on retained modes
    rels = []
    for i in range(8):
        e, c = ev_exact[i], ev_c[i]
        sel = e > max(e.max(), 1e-30) * 1e-2
        k = int(sel.sum())
        if k: rels.append(np.abs(c[-k:]/e[-k:] - 1).max())
    print(f"   max rel vs exact (top modes): {max(rels) if rels else 'n/a'}", flush=True)
