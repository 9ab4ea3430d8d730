"""One-off larger-scale stress run of the resident product path."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import mstep, resident
import bench

tel = cylinder.UnpolarisedCylinderTelescope.from_config(dict(
    num_freq=16, freq_start=450.0, freq_end=500.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=16.0, num_feeds=12, feed_spacing=0.6,
    tsys=50.0, single_precision=True,
))
nm = tel.mmax + 1
nfb = tel.npairs * tel.nfreq
ndof = tel.nfreq * min(tel.lmax + 1, 2 * tel.npairs)
print(f"large: nm={nm} nfb={nfb} lmax={tel.lmax} ndof={ndof}", flush=True)

cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]

st = time.time()
pos, neg = resident.btm_resident(tel, blg, fig)
_ = float(np.asarray(pos.re.sum()))
print(f"BTM warm: {time.time()-st:.1f}s", flush=True)
st = time.time()
pos, neg = resident.btm_resident(tel, blg, fig)
_ = float(np.asarray(pos.re.sum()))
t_btm = time.time()-st
print(f"BTM steady: {t_btm:.1f}s", flush=True)

st = time.time()
resident.product_all_resident(tel, pos, neg, ls, lf, noisew, max_m=8)
print(f"product warm: {time.time()-st:.1f}s", flush=True)
st = time.time()
evals, nmodes = resident.product_all_resident(tel, pos, neg, ls, lf, noisew)
t_prod = time.time()-st
print(f"product steady: {t_prod:.1f}s; rate {nm/(t_btm+t_prod):.2f} m-modes/s", flush=True)
print("finite:", np.isfinite(evals).all(), "max eval:", evals.max(), flush=True)
