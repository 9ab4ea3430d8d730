#!/usr/bin/env python
"""Measure where the bench time goes on the TPU."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from driftscan_tpu.ops import zarray as za, fpencil
from driftscan_tpu.parallel import mstep


def t(fn, n=3):
    fn()  # warm
    st = time.time()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - st) / n


def main():
    tel = bench.build_telescope()
    nl = tel.lmax + 1
    print(f"nl={nl} npairs={tel.npairs} nfreq={tel.nfreq} mmax={tel.mmax}", flush=True)

    # --- batched eigh floor ---
    rng = np.random.default_rng(0)
    for n, b in [(704, 8), (704, 1), (352, 8)]:
        a = rng.standard_normal((b, n, n)).astype(np.float32)
        a = a + a.transpose(0, 2, 1)
        aj = jnp.asarray(a)
        f = jax.jit(jnp.linalg.eigh)
        dt = t(lambda: f(aj))
        print(f"eigh batch={b} n={n}: {dt*1e3:.1f} ms", flush=True)

    # --- gram_bands / kl_solve cost ---
    ndof = tel.nfreq * min(nl, 2 * tel.npairs)
    for K, levels in [(nl * tel.nfreq, 8), (nl * tel.nfreq, 5)]:
        x = za.Z(
            jnp.asarray(rng.standard_normal((8, ndof, K)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((8, ndof, K)).astype(np.float32)),
        )
        f = jax.jit(jax.vmap(lambda z: fpencil.gram_bands(z, levels=levels)))
        dt = t(lambda: f(x))
        print(f"gram_bands vmap8 ndof={ndof} K={K} levels={levels}: {dt*1e3:.1f} ms", flush=True)

    # --- full product step per batch ---
    cl_s, cl_n, noisew, npower = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    step = mstep.jit_product_step_split(npol=tel.num_pol_sky, nl=nl)
    tarray = None
    import os
    if os.path.exists("/root/repo/scratch/tarray.npz"):
        tarray = np.load("/root/repo/scratch/tarray.npz")["tarray"]
    else:
        tarray, dtb, nunits = bench.btm_phase(tel)
        np.savez("/root/repo/scratch/tarray.npz", tarray=np.asarray(tarray))
        print(f"BTM phase: {dtb:.1f}s / {nunits} units", flush=True)

    beam, mv = bench._beam_batch(tarray, np.arange(8), tel, 8)
    br = np.ascontiguousarray(beam.real)
    bi = np.ascontiguousarray(beam.imag)
    dt = t(lambda: step(br, bi, noisew, ls, lf, mv))
    print(f"product step mbatch=8: {dt*1e3:.1f} ms -> {dt/8*1e3:.1f} ms/m", flush=True)

    # host packing cost
    st = time.time()
    for s in range(0, 80, 8):
        bench._beam_batch(tarray, np.arange(s, s + 8), tel, 8)
    print(f"host _beam_batch: {(time.time()-st)/10*1e3:.1f} ms/batch", flush=True)

    # --- BTM phase breakdown ---
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    from driftscan_tpu.core import telescope as T
    lmax_arr, _ = T.max_lm(tel.baselines[blg], tel.wavelengths[fig], tel.u_width, tel.v_width)
    lmax_arr = np.ceil(lmax_arr * tel.l_boost).astype(int)
    nsides = np.array([tel._nside_for(int(l)) for l in lmax_arr])
    print("nside buckets:", {int(ns): int((nsides == ns).sum()) for ns in np.unique(nsides)}, flush=True)

    for ns in np.unique(nsides):
        sel = np.nonzero(nsides == ns)[0]
        sub_lmax = int(lmax_arr[sel].max())
        st = time.time()
        tel._transfer_batch(blg[sel], fig[sel], int(ns), sub_lmax, tel.lmax)
        print(f"bucket nside={ns}: {len(sel)} units lmax={sub_lmax}: {time.time()-st:.2f}s", flush=True)
        st = time.time()
        tel._transfer_batch(blg[sel], fig[sel], int(ns), sub_lmax, tel.lmax)
        print(f"   (second call: {time.time()-st:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
