#!/usr/bin/env python
"""A/B the SHT m-chunk size and stage timings on the big BTM bucket."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from driftscan_tpu.ops import sht
from driftscan_tpu.core import telescope as T


def main():
    tel = bench.build_telescope()
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    lmax_arr, _ = T.max_lm(
        tel.baselines[blg], tel.wavelengths[fig], tel.u_width, tel.v_width
    )
    lmax_arr = np.ceil(lmax_arr * tel.l_boost).astype(int)
    nsides = np.array([tel._nside_for(int(l)) for l in lmax_arr])
    ns = int(nsides.max())
    sel = np.nonzero(nsides == ns)[0]
    sub_lmax = int(lmax_arr[sel].max())
    print(f"bucket nside={ns}: {len(sel)} units lmax={sub_lmax}", flush=True)

    # build the beam maps once (device)
    tel._init_trans(ns)
    nu = len(sel)
    nu_pad = 1 << max(nu - 1, 0).bit_length()
    bsel = np.concatenate([blg[sel], np.repeat(blg[sel][-1], nu_pad - nu)])
    fsel = np.concatenate([fig[sel], np.repeat(fig[sel][-1], nu_pad - nu)])

    st = time.time()
    cvis = tel._beam_map_batch_split(bsel, fsel)
    _ = float(np.asarray(cvis.re).ravel()[0])
    print(f"beam maps ({nu_pad} units): {time.time()-st:.2f}s", flush=True)
    cvis32 = jax.tree.map(lambda x: x.astype(jnp.float32), cvis)

    st = time.time()
    cvis2 = tel._beam_map_batch_split(bsel, fsel)
    _ = float(np.asarray(cvis2.re).ravel()[0])
    print(f"beam maps again: {time.time()-st:.2f}s", flush=True)

    orig = sht._chunk_size
    for mc_target in [8, 32, 64, 128]:
        sht._chunk_size = lambda nring, maxlen, nm, budget_bytes=0, _m=mc_target: min(
            _m, nm
        )
        sht._analysis_split.clear_cache()
        st = time.time()
        out = sht._analysis_split(
            cvis32.re.conj() if hasattr(cvis32, "re") else cvis32[0],
            -cvis32.im if hasattr(cvis32, "im") else cvis32[1],
            ns,
            sub_lmax,
            sub_lmax,
            True,
        )
        _ = float(np.asarray(out[0]).ravel()[0])  # force full execution
        t_compile = time.time() - st
        steadies = []
        for _i in range(2):
            st = time.time()
            out = sht._analysis_split(
                cvis32.re, cvis32.im, ns, sub_lmax, sub_lmax, True
            )
            _ = np.asarray(out[0]).sum() + np.asarray(out[2]).sum()
            steadies.append(time.time() - st)
        print(
            f"mc={mc_target}: compile+run {t_compile:.2f}s, steady {min(steadies):.2f}s",
            flush=True,
        )
    sht._chunk_size = orig


if __name__ == "__main__":
    main()
