"""Scout the north-star Fisher band factors on the host.

Builds one (and optionally all) band C_l at north-star scale
(256 freqs, lmax ~1006), factors it with the rank-compacted path, and
reports rank/width/time — the numbers that size the Fisher phase's
device table and decide the rank_rtol default.  Writes the full table
to /root/repo/.cache/ns_band_lt.npz when NS_BANDS_ALL=1 (the north-star run's cache).
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from driftscan_tpu.core import psestimation, skymodel
from driftscan_tpu.parallel import mstep
from driftscan_tpu.telescope import cylinder

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
nl, F = tel.lmax + 1, tel.nfreq
print(f"lmax={tel.lmax} F={F}", flush=True)

NBANDS = int(os.environ.get("NS_NBANDS", "10"))
edges = np.linspace(0.0, 0.4, NBANDS + 1)
cr = skymodel.Corr21cm()
cr.ps_2d = False
RTOL = float(os.environ.get("NS_BAND_RTOL", "1e-9"))

def band_pk(ks, ke):
    f = psestimation.bandfunc_2d_polar(ks, ke, 0.0, np.pi / 2)
    return lambda k, mu: cr.ps_vv(k) * f(k, mu)

def one_band(ks, ke):
    t0 = time.time()
    crt = skymodel.Corr21cm(ps=band_pk(ks, ke), redshift=1.5)
    crt.ps_2d = True
    clzz = skymodel.im21cm_model(
        tel.lmax, tel.frequencies, tel.num_pol_sky, cr=crt, temponly=True
    )
    t1 = time.time()
    lt = mstep.band_factor_table([clzz], out_dtype=np.float32,
                                 rank_rtol=RTOL)
    t2 = time.time()
    # true per-band width before cross-band padding
    k = lt.shape[-1]
    print(
        f"band [{ks:.3f},{ke:.3f}): clzz {t1-t0:.1f}s factor {t2-t1:.1f}s "
        f"K={k} max|cl|={np.abs(clzz).max():.3e}",
        flush=True,
    )
    return clzz

if os.environ.get("NS_BANDS_ALL") == "1":
    cls = [one_band(ks, ke) for ks, ke in zip(edges[:-1], edges[1:])]
    t0 = time.time()
    band_lt = mstep.band_factor_table(cls, out_dtype=np.float32,
                                      rank_rtol=RTOL)
    print(f"joint factor table {time.time()-t0:.1f}s shape={band_lt.shape} "
          f"bytes={band_lt.nbytes/2**20:.0f} MiB", flush=True)
    np.savez("/root/repo/.cache/ns_band_lt.npz", band_lt=band_lt, k_edges=edges,
             rank_rtol=RTOL)
    print("wrote /root/repo/.cache/ns_band_lt.npz", flush=True)
else:
    one_band(edges[1], edges[2])  # a representative low-k band
    one_band(edges[NBANDS - 1], edges[NBANDS])  # the widest high-k band
