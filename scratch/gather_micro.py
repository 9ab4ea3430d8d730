import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.telescope import cylinder, cylbeam

tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)
def sync(x): jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)

par, fx = tel._beam_bank_rows(100, True)
f = lambda: cylbeam._beam_bank_kernel(tel._angpos_cart, tel._horizon, fx, par, polarised=True)
sync(f())
t0=time.time()
for _ in range(5): out = f()
sync(out)
print(f"bank kernel warm: {(time.time()-t0)/5*1000:.0f} ms", flush=True)

cart, hz = tel._angpos_cart, tel._horizon
# isolate: gather
fx1 = fx[0]
@jax.jit
def g_interp(cart, fx1):
    x = cart @ jnp.asarray(np.array([1.,0.,0.],np.float32))
    t = (x + 1.0) * (fx1.shape[0]/2.2)
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, fx1.shape[0]-2)
    frac = t - i0.astype(t.dtype)
    return fx1[i0]*(1.0-frac) + fx1[i0+1]*frac
sync(g_interp(cart, fx1))
t0=time.time()
for _ in range(5): o = g_interp(cart, fx1)
sync(o)
print(f"interp gather alone: {(time.time()-t0)/5*1000:.0f} ms", flush=True)

@jax.jit
def g_pol(cart):
    import driftscan_tpu.ops.kernels as K
    return K.polpattern(cart, jnp.asarray(np.array([1.,0.,0.],np.float32)))
sync(g_pol(cart))
t0=time.time()
for _ in range(5): o = g_pol(cart)
sync(o)
print(f"polpattern alone: {(time.time()-t0)/5*1000:.0f} ms", flush=True)

@jax.jit
def g_exptan(cart):
    import driftscan_tpu.ops.kernels as K
    return K.beam_exptan(cart @ jnp.asarray(np.array([0.,1.,0.],np.float32)), 1.2)
sync(g_exptan(cart))
t0=time.time()
for _ in range(5): o = g_exptan(cart)
sync(o)
print(f"exptan alone: {(time.time()-t0)/5*1000:.0f} ms", flush=True)
