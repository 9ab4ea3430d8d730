"""Probe: window-1 BTM of the north-star problem with chunk logging."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
os.environ.setdefault("DRIFTSCAN_TPU_SHT_BUDGET_GB", "6.0")
os.environ["DRIFTSCAN_TPU_DEBUG_CHUNKS"] = "1"
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import resident

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
nm = tel.mmax + 1
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
W = 16
m1 = int(np.linspace(0, nm, W + 1).astype(int)[1])
t0 = time.time()
pos, neg = resident.btm_resident(tel, blg, fig, m_range=(0, m1))
s = float(np.asarray(pos.re.sum()))
print(f"window-1 btm done in {time.time()-t0:.1f}s sum={s:.4g}", flush=True)
