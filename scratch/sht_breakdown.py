"""Fetch-timed breakdown of the windowed SHT chunk at north-star scale."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht, zarray as za

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)
def fetch(x): return float(np.asarray(x))
def bench(label, fn, n=3):
    fetch(fn()); t0 = time.time()
    for _ in range(n): fetch(fn())
    print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

bsel = np.array([0,1,2,3]); fsel = np.array([100]*4)
t0 = time.time(); b = tel._beam_device(0, 100); fetch(b.sum())
print(f"first beam (bank upload+compile): {time.time()-t0:.1f}s", flush=True)
bench("beam pair eval (fresh freq)", lambda: (tel._beam_dev_cache.clear() or
    tel._beam_dev_cache.__setitem__('_', 0) or tel._beam_dev_cache.pop('_') or
    tel._beam_device(0, 101).sum() + tel._beam_device(1, 101).sum()), n=3)
bench("beam map batch take=4", lambda: tel._beam_map_batch_split(bsel, fsel).re.sum())
cvis = tel._beam_map_batch_split(bsel, fsel)
cvis = za.Z(cvis.re.astype(jnp.float32), cvis.im.astype(jnp.float32))
bench("windowed SHT take=4 (belt split)", lambda: sht.analysis_split(
    cvis.conj(), lmax=1006, neg_m=True, m_window=(0,62), nside=1024,
    ring_padded=True)[0].re.sum())
g = sht.geom_arrays(1024)
mv = jnp.arange(62, dtype=jnp.int64)
lam = sht._legendre_table(sht.ring_geometry(1024), 1006, 61, jnp.float32, m_start=0)
@jax.jit
def leg_only(a):
    return jnp.einsum("lmr,bmr->blm", lam[0], a).sum()
f = jnp.ones((16, 62, 4095), jnp.float32)
bench("legendre contraction alone", lambda: leg_only(f))
