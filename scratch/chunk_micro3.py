import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import zarray as za

def sync(x): jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)

# --- f64 chol compile/run on chip (the dd-f64 risk check) ---
n = 512
rng = np.random.default_rng(0)
a = rng.standard_normal((2*n, 2*n+16)).astype(np.float64) / np.sqrt(2*n)
s_e = a @ a.T + 0.01*np.eye(2*n)
t0=time.time()
L = jnp.linalg.cholesky(jnp.asarray(s_e)); sync(L)
print(f"f64 chol ({2*n}^2) first: {time.time()-t0:.1f}s", flush=True)
t0=time.time()
for _ in range(3): L = jnp.linalg.cholesky(jnp.asarray(s_e))
sync(L)
print(f"f64 chol warm: {(time.time()-t0)/3*1000:.0f} ms; finite={bool(jnp.isfinite(L).all())}", flush=True)

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)
t0=time.time(); b = tel._beam_device(0, 0); sync(b)
print(f"beam eval first (jitted, incl compile): {time.time()-t0:.1f}s", flush=True)
for trial in range(3):
    fi = 10 + trial
    t0 = time.time()
    ba = tel._beam_device(0, fi); bb = tel._beam_device(1, fi); sync((ba, bb))
    print(f"beam eval pair, new freq {fi}: {(time.time()-t0)*1000:.0f} ms", flush=True)
