import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from driftscan_tpu.telescope import cylinder
tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
    num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=30.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
tel._init_trans(1024)
def sync(x): jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)
b = tel._beam_device(0, 0); sync(b)  # warm: bank upload + compile
import cProfile, pstats
for fi in (10, 11):
    t0=time.time(); ba = tel._beam_device(0, fi); bb = tel._beam_device(1, fi); sync((ba,bb))
    print(f"pair freq {fi}: {(time.time()-t0)*1000:.0f} ms", flush=True)
pr = cProfile.Profile(); pr.enable()
ba = tel._beam_device(0, 50); bb = tel._beam_device(1, 50); sync((ba,bb))
pr.disable()
pstats.Stats(pr).sort_stats("cumulative").print_stats(12)
