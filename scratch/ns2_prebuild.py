"""Prebuild ns2's host-side caches on the CPU backend.

northstar2.py builds `.cache/ns2_cov_cache.npz` and
`.cache/ns2_band_lt.npz` inline if missing — inside the TPU client
process, which leaves the chip idle while the host grinds.  The fresh
container wiped `.cache/`, so this script rebuilds both with the exact
same code paths and filenames, CPU-pinned (JAX_PLATFORMS is ignored on
this runtime; in-script config is the only reliable pin) so it can run
niced alongside the ns1 device run without contending for the chip.
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

import bench
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import mstep

T0 = time.time()


def log(msg):
    print(f"[ns2pre +{time.time()-T0:7.1f}s] {msg}", flush=True)


tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=16, freq_start=400.0, freq_end=500.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=15.0, num_feeds=9,
    feed_spacing=1.0, tsys=50.0, single_precision=True,
))
log(f"telescope: nfreq={tel.nfreq} lmax={tel.lmax} npairs={tel.npairs}")

os.makedirs("/root/repo/.cache", exist_ok=True)

cov_path = "/root/repo/.cache/ns2_cov_cache.npz"
if not os.path.exists(cov_path):
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    tmp = cov_path + ".tmp.npz"
    np.savez(tmp, ls=ls, lf=lf, noisew=noisew)
    os.replace(tmp, cov_path)
    log(f"cov cache written (K_s={ls.shape[-1]}, K_f={lf.shape[-1]})")
else:
    log("cov cache already present")

blt_path = "/root/repo/.cache/ns2_band_lt.npz"
if not os.path.exists(blt_path):
    from driftscan_tpu.core import psestimation, skymodel

    nb = 10
    edges_k = np.linspace(0.0, 0.4, nb + 1)
    cr = skymodel.Corr21cm()
    cr.ps_2d = False

    def _band_cls():
        for ks, ke in zip(edges_k[:-1], edges_k[1:]):
            bf = psestimation.bandfunc_2d_polar(ks, ke, 0.0, np.pi / 2)
            crt = skymodel.Corr21cm(
                ps=(lambda k, mu, f=bf: cr.ps_vv(k) * f(k, mu)),
                redshift=1.5,
            )
            crt.ps_2d = True
            yield skymodel.im21cm_model(
                tel.lmax, tel.frequencies, tel.num_pol_sky,
                cr=crt, temponly=True,
            )

    band_lt = mstep.band_factor_table(
        _band_cls(), out_dtype=np.float32, rank_rtol=1e-9
    )
    tmp = blt_path + ".tmp.npz"
    np.savez(tmp, band_lt=band_lt, k_edges=edges_k)
    os.replace(tmp, blt_path)
    log(f"band table written {band_lt.shape} "
        f"({band_lt.nbytes/2**20:.0f} MiB)")
else:
    log("band table already present")
log("DONE")
