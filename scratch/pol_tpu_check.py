"""Polarised resident product path on the chip vs host-f64 dense anchors."""
import sys, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import mstep, resident
from driftscan_tpu.ops import fpencil, zarray as za
import bench

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=3, freq_start=400.0, freq_end=420.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=4.0, num_feeds=3, feed_spacing=1.0,
    tsys=50.0, single_precision=True,
))
print(f"pol tel: mmax={tel.mmax} npairs={tel.npairs} npol={tel.num_pol_sky}", flush=True)
cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
pos, neg = resident.btm_resident(tel, blg, fig)
nl = tel.lmax + 1
nw = jnp.asarray(noisew, dtype=pos.re.dtype)
lsj = jnp.asarray(ls, dtype=pos.re.dtype)
lfj = jnp.asarray(lf, dtype=pos.re.dtype)

ev, nmo = resident.product_all_resident(tel, pos, neg, lsj, lfj, nw, mbatch=8)
print("spectrum finite:", np.isfinite(ev).all(), "max:", ev.max(), flush=True)

# dense f64 anchors on two m's from the device beams
mv = jnp.asarray(np.arange(0, 8, dtype=np.int32))
res = resident._resident_batch(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
                               npairs=tel.npairs, nfreq=tel.nfreq, nl=nl,
                               npol=tel.num_pol_sky)
bs = np.asarray(res.beam_re) + 1j*np.asarray(res.beam_im)
F, S = bs.shape[1], bs.shape[2]
npol = tel.num_pol_sky
for i in (1, 4):
    b4 = za.Z(jnp.asarray(bs[i].real.reshape(F, S, npol, nl)),
              jnp.asarray(bs[i].imag.reshape(F, S, npol, nl)))
    zs = fpencil.beam_factor(b4, lsj); zf = fpencil.beam_factor(b4, lfj)
    a_s = (np.asarray(zs.re) + 1j*np.asarray(zs.im)).astype(np.complex128)
    a_f = (np.asarray(zf.re) + 1j*np.asarray(zf.im)).astype(np.complex128)
    evd, _ = fpencil.kl_solve_dense_ref(a_s, a_f)
    e = np.sort(evd)[::-1]; c = np.sort(ev[i].astype(np.float64))[::-1][:e.size]
    k = min(32, int((e > max(e[0]*1e-4, 1e-30)).sum()))
    rel = np.abs(c[:k]/e[:k] - 1) if k else np.array([0.0])
    print(f"m={i}: top{k} max rel vs dense {rel.max():.2e} (top {e[0]:.3e})", flush=True)
