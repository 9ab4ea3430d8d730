import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.ops import sht

g = sht.geom_arrays(1024)
npix = 12*1024**2
def fetch(x): return float(np.asarray(x))
def bench(label, fn, n=3):
    fetch(fn()); t0 = time.time()
    for _ in range(n): fetch(fn())
    print(f"{label}: {(time.time()-t0)/n*1000:.0f} ms", flush=True)

maps16 = jnp.ones((16, npix), jnp.float32)
idx = g.pix_index

@jax.jit
def take_mode(m):
    return (jnp.take(m, idx, axis=-1, mode="clip") * g.mask).sum()
bench("pad gather promise_in_bounds", lambda: take_mode(maps16))

# transposed gather: rows-of-pixels layout
mT = jnp.ones((npix, 16), jnp.float32)
@jax.jit
def take_rows(mT):
    return (jnp.take(mT, idx.reshape(-1), axis=0, mode="clip")).sum()
bench("pad gather rows-major (npix,16)", lambda: take_rows(mT))

# beam-table gather: 12.6M indices into 16k table
tab = jnp.asarray(np.random.rand(16384).astype(np.float32))
tab2 = jnp.stack([tab, jnp.roll(tab, -1)], axis=-1)  # (16k, 2)
i0 = jnp.asarray(np.random.randint(0, 16383, npix).astype(np.int32))
@jax.jit
def g1(tab, i0):
    return (tab[i0] + tab[i0+1]).sum()
bench("beam gather x2 separate", lambda: g1(tab, i0))
@jax.jit
def g2(tab2, i0):
    p = jnp.take(tab2, i0, axis=0, mode="clip")
    return (p[:, 0] + p[:, 1]).sum()
bench("beam gather pair rows", lambda: g2(tab2, i0))
