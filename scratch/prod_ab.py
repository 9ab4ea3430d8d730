#!/usr/bin/env python
"""A/B the product batch: levels sweep and stage isolation on TPU."""

import sys
import time
import functools

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from driftscan_tpu.ops import linalg
from driftscan_tpu.parallel import mstep, resident


def sync(x):
    return float(np.asarray(jax.tree.leaves(x)[0]).ravel()[0])


def t(f, *a, n=3):
    out = f(*a)
    sync(out)
    best = np.inf
    for _ in range(n):
        st = time.time()
        out = f(*a)
        sync(out)
        best = min(best, time.time() - st)
    return best


def main():
    tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    pos, neg = resident.btm_resident(tel, blg, fig)
    nl = tel.lmax + 1
    nw = jnp.asarray(noisew, dtype=pos.re.dtype)
    lsj = jnp.asarray(ls, dtype=pos.re.dtype)
    lfj = jnp.asarray(lf, dtype=pos.re.dtype)
    mv = jnp.asarray(np.arange(8, 16, dtype=np.int32))

    for fgl, sgl in [(8, 5), (4, 3), (1, 1)]:
        f = functools.partial(
            resident._spectrum_batch,
            npairs=tel.npairs,
            nfreq=tel.nfreq,
            nl=nl,
            fg_levels=fgl,
            sig_levels=sgl,
        )
        dt = t(lambda: f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv))
        print(f"spectrum batch fg={fgl} sig={sgl}: {dt*1e3:.0f} ms", flush=True)

    # triple SVD stage alone on the same batch shapes
    beams_re = jnp.zeros((8, tel.nfreq, 2 * tel.npairs, nl), dtype=pos.re.dtype)
    beams_im = beams_re

    @jax.jit
    def svd_only(br, bi):
        def one(br1, bi1):
            return linalg.triple_svd_split_batched(br1, bi1, npol=1, nl=nl)[4]

        return jax.vmap(one)(br, bi)

    dt = t(lambda: svd_only(beams_re, beams_im))
    print(f"triple-SVD stage alone: {dt*1e3:.0f} ms", flush=True)

    # beam build alone
    @jax.jit
    def build_only(m):
        p = jnp.take(pos.re, m, axis=-1)
        return p.sum()

    dt = t(lambda: build_only(mv))
    print(f"beam gather alone: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
