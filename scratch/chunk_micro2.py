import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht, zarray as za
from driftscan_tpu.parallel import resident

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)

def sync(x): jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)

# warm the kernels on freq 0
b = tel._beam_device(0, 0); sync(b)
b2 = tel._beam_device(1, 0); sync(b2)
# now time fresh freqs (cache misses, kernels warm)
for trial in range(3):
    fi = 10 + trial
    t0 = time.time()
    ba = tel._beam_device(0, fi)
    bb = tel._beam_device(1, fi)
    sync((ba, bb))
    print(f"beam eval pair, new freq {fi}: {(time.time()-t0)*1000:.0f} ms", flush=True)

# full chunk: run btm_resident on 12 units (fresh m-window) and time it warm
bl = np.zeros(12, np.int64); fi = np.arange(20, 32)
t0 = time.time()
pos, neg = resident.btm_resident(tel, bl, fi, m_range=(0, 62))
s = float(np.asarray(pos.re.sum()))
print(f"12-unit windowed btm (warm kernels, fresh freqs): {time.time()-t0:.1f} s", flush=True)
t0 = time.time()
pos, neg = resident.btm_resident(tel, bl, fi, m_range=(62, 124))
s = float(np.asarray(pos.re.sum()))
print(f"12-unit windowed btm (second window, beams cached): {time.time()-t0:.1f} s", flush=True)
