import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.telescope import cylinder, cylbeam
from driftscan_tpu.ops import sht, zarray as za

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)

def fetch(x):  # force execution: scalar reduce + host transfer
    return float(np.asarray(x.sum() if hasattr(x, "sum") else x))

def bench(label, fn, red, n=3):
    fetch(red(fn()))  # warm
    t0 = time.time()
    for _ in range(n): fetch(red(fn()))
    print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

# beam pair via bank
par, fx = tel._beam_bank_rows(100, True)
bench("bank pair eval", lambda: cylbeam._beam_bank_kernel(tel._angpos_cart, tel._horizon, fx, par, polarised=True), lambda o: o[0,0,0] + o.sum())

# beam map batch at take=4 (4 units, same freq)
bsel = np.array([0,1,2,3]); fsel = np.array([100]*4)
bench("beam map batch take=4", lambda: tel._beam_map_batch_split(bsel, fsel), lambda o: o.re.sum())

cvis = tel._beam_map_batch_split(bsel, fsel)
cvis = za.Z(cvis.re.astype(jnp.float32), cvis.im.astype(jnp.float32))
bench("windowed SHT take=4", lambda: sht.analysis_split(cvis.conj(), lmax=1006, neg_m=True, m_window=(0,62)), lambda o: o[0].re.sum())

bench("windowed SHT w=62 m0=500", lambda: sht.analysis_split(cvis.conj(), lmax=1006, neg_m=True, m_window=(500,562)), lambda o: o[0].re.sum(), n=2)
bench("full SHT (all m)", lambda: sht.analysis_split(cvis.conj(), lmax=1006, neg_m=True), lambda o: o[0].re.sum(), n=2)
bench("windowed SHT take=4 again", lambda: sht.analysis_split(cvis.conj(), lmax=1006, neg_m=True, m_window=(0,62)), lambda o: o[0].re.sum(), n=2)
