import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht, zarray as za

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))

def sync(x):
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)

def bench(label, fn, n=5):
    fn(); sync(fn())  # warm
    t0 = time.time()
    outs = [fn() for _ in range(n)]
    sync(outs[-1])
    print(f"{label}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)

# 0. launch RTT
one = jnp.ones((8, 8), jnp.float32)
f_triv = jax.jit(lambda x: x + 1)
bench("trivial jit launch", lambda: f_triv(one), n=20)

# 1. beam map batch (1 unit, nside 1024)
tel._init_trans(1024)
bsel = np.array([0]); fsel = np.array([255])
t0=time.time()
cvis = tel._beam_map_batch_split(bsel, fsel); sync(cvis)
print(f"beam first (eval+cache): {time.time()-t0:.2f} s", flush=True)
bench("beam map batch (cached)", lambda: tel._beam_map_batch_split(bsel, fsel), n=5)

cvis32 = za.Z(cvis.re.astype(jnp.float32), cvis.im.astype(jnp.float32))
# 2. windowed SHT
t0=time.time()
p, n_ = sht.analysis_split(cvis32.conj(), lmax=1006, neg_m=True, m_window=(0, 62)); sync(p)
print(f"sht first (incl table build): {time.time()-t0:.2f} s", flush=True)
bench("windowed analysis_split", lambda: sht.analysis_split(cvis32.conj(), lmax=1006, neg_m=True, m_window=(0, 62)), n=5)
