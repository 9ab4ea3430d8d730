"""Stage-isolated profile of the nside-256 BTM path (one 64-unit chunk)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht, zarray as za

tel = cylinder.UnpolarisedCylinderTelescope.from_config(dict(
    num_freq=16, freq_start=450.0, freq_end=500.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=16.0, num_feeds=12, feed_spacing=0.6,
    tsys=50.0, single_precision=True))
lmax = tel.lmax
nside = tel._nside_for(int(np.ceil(lmax * tel.l_boost)))
print(f"lmax={lmax} nside={nside}", flush=True)

def t(f, *a, n=3):
    out = f(*a)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = np.inf
    for _i in range(n):
        st = time.time()
        out = f(*a)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - st)
    return best

bl = np.arange(tel.npairs)[:64]
fi = np.zeros_like(bl)
tel._init_trans(nside)

# stage 1: beam maps
st = time.time()
cvis = tel._beam_map_batch_split(bl, fi)
_ = float(np.asarray(cvis.re.sum()))
print(f"beam-map compile+run: {time.time()-st:.1f}s", flush=True)
dt = t(lambda: tel._beam_map_batch_split(bl, fi))
print(f"beam-map steady (64 units): {dt:.2f}s", flush=True)

cvis32 = za.Z(cvis.re.astype(jnp.float32), cvis.im.astype(jnp.float32))
# stage 2: SHT
st = time.time()
p, n_ = sht.analysis_split(cvis32.conj(), lmax=lmax, neg_m=True)
_ = float(np.asarray(p.re.sum()))
print(f"SHT compile+run: {time.time()-st:.1f}s", flush=True)
dt = t(lambda: sht.analysis_split(cvis32.conj(), lmax=lmax, neg_m=True))
print(f"SHT steady (64 units): {dt:.2f}s", flush=True)
