"""Time the QR product step vs the gram engine on the TPU at bench scale."""
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
print("btm ready", flush=True)

def sweep(tag, **kw):
    f = functools.partial(resident._spectrum_batch, npairs=tel.npairs,
                          nfreq=tel.nfreq, nl=nl, **kw)
    st = time.time()
    ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    ev0 = np.asarray(ev); tc = time.time() - st
    best = np.inf
    for _ in range(3):
        st = time.time()
        ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
        _ = float(np.asarray(ev).ravel()[0])
        best = min(best, time.time() - st)
    print(f"{tag}: compile {tc:.1f}s steady {best*1e3:.0f} ms finite={np.isfinite(ev0).all()}", flush=True)
    return ev0

ev_qr = sweep("QR sig3 br=0.03")
ev_qr2 = sweep("QR sig2 br=0.03", sig_levels=2)
ev_qrc = sweep("QR sig3 +sigcap128", sig_k_cap=128)
ev_gram = sweep("gram fg8 sig5 br=0.1", method="gram", fg_levels=8, sig_levels=5, band_rel=1e-1)

# full-result batch (evecs computed) timing for the production path
f = functools.partial(resident._resident_batch, npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
st = time.time()
res = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
_ = float(np.asarray(res.evals).ravel()[0]); tc = time.time() - st
st = time.time()
res = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
_ = float(np.asarray(res.evals).ravel()[0])
print(f"QR full-result batch: compile {tc:.1f}s steady {(time.time()-st)*1e3:.0f} ms", flush=True)

# accuracy vs each other on top modes
for tag, ev in [("sig2", ev_qr2), ("sigcap", ev_qrc)]:
    rel = []
    for i in range(8):
        e = np.sort(ev_qr[i])[::-1][:64]; c = np.sort(ev[i])[::-1][:64]
        rel.append(np.abs(c/np.maximum(e, 1e-30) - 1).max())
    print(f"{tag} vs QR-sig3 top64: max rel {max(rel):.2e}", flush=True)
