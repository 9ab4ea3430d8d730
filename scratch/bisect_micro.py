import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht, kernels as K

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)
cart, hz = tel._angpos_cart, tel._horizon
g = sht.geom_arrays(1024)

def fetch(x): return float(np.asarray(x))
def bench(label, fn, n=3):
    fetch(fn())
    t0 = time.time()
    for _ in range(n): fetch(fn())
    print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

mv = jnp.arange(64, dtype=jnp.int64)

@jax.jit
def phase_only(mv):
    ph = sht._phase_angle(mv, g, 1024, jnp.float32)
    return ph.sum()

@jax.jit
def phase_cos_sin(mv):
    ph = sht._phase_angle(mv, g, 1024, jnp.float32)
    return (jnp.cos(ph) + jnp.sin(ph)).sum()

bench("phase angle (64 m)", lambda: phase_only(mv))
bench("phase + cos/sin (64 m)", lambda: phase_cos_sin(mv))

# ring-pad gather
@jax.jit
def pad16(m):
    return (jnp.take(m, g.pix_index, axis=-1) * g.mask).sum()
maps16 = jnp.ones((16, 12*1024**2), jnp.float32)
bench("ring-pad gather (16 rows)", lambda: pad16(maps16))

# beam kernel pieces
par, fx = tel._beam_bank_rows(100, True)
fx1, p1 = fx[0], par[0]
@jax.jit
def amp_only(fx1, p1):
    x = cart @ p1[3:6]
    t = (x - p1[0]) * p1[1]
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, fx1.shape[0]-2)
    frac = t - i0.astype(t.dtype)
    ew = fx1[i0]*(1.0-frac) + fx1[i0+1]*frac
    ns = K.beam_exptan(cart @ p1[6:9], p1[2])
    return (ew*ns*hz).sum()
bench("beam amp (1 class, no pol)", lambda: amp_only(fx1, p1))

@jax.jit
def pol_only(p1):
    return K.polpattern(cart, p1[9:12]).sum()
bench("polpattern alone", lambda: pol_only(p1))
