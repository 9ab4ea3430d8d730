#!/usr/bin/env python
"""Prebuild ns1b's host-side caches while the chip runs ns2.

Writes exactly the files scratch/northstar2.py (NS2_PRESET=ns1b) would
build in its setup phase — .cache/ns1b_cov_cache.npz and
.cache/ns1b_band_lt.npz — so the deadline-squeezed last chain step
spends its chip window on windows, not setup.  Pure host work: jax is
pinned to CPU before first device touch and the artifacts are
backend-independent numpy arrays (atomic writes; a concurrent reader
never sees a partial file).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import bench
from driftscan_tpu.core import psestimation, skymodel
from driftscan_tpu.parallel import mstep
from driftscan_tpu.telescope import cylinder

os.makedirs("/root/repo/.cache", exist_ok=True)

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=32, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=31.0, num_feeds=4,
    feed_spacing=1.5, tsys=50.0, single_precision=True,
    ndays=int(os.environ.get("NS_NDAYS", "733")),
))

cov_path = "/root/repo/.cache/ns1b_cov_cache.npz"
if not os.path.exists(cov_path):
    st = time.time()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    np.savez(cov_path + ".tmp.npz", ls=ls, lf=lf, noisew=noisew)
    os.replace(cov_path + ".tmp.npz", cov_path)
    print(f"cov cache built {time.time()-st:.1f}s "
          f"(K_signal {ls.shape[-1]}, K_fg {lf.shape[-1]})", flush=True)
else:
    print("cov cache already present", flush=True)

blt_path = "/root/repo/.cache/ns1b_band_lt.npz"
if not os.path.exists(blt_path):
    st = time.time()
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
    np.savez(blt_path + ".tmp.npz", band_lt=band_lt, k_edges=edges_k)
    os.replace(blt_path + ".tmp.npz", blt_path)
    print(f"band factor table built {time.time()-st:.1f}s "
          f"{band_lt.shape} {band_lt.nbytes/2**20:.0f} MiB", flush=True)
else:
    print("band table already present", flush=True)
