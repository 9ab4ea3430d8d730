#!/usr/bin/env python
"""Repro harness for the full-scale TPU product-step fault.

Caches the BTM tarray in /root/repo/scratch/tarray.npz so iterations on
the product step don't pay the 20 s BTM phase.

Usage:
  python scratch/repro_fault.py btm      # compute + cache tarray
  python scratch/repro_fault.py prod     # run product phase from cache
  python scratch/repro_fault.py bisect   # run sub-stages separately
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CACHE = "/root/repo/scratch/tarray.npz"


def get_tel():
    import bench

    return bench.build_telescope()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "prod"
    import bench

    tel = get_tel()
    if mode == "btm" or not os.path.exists(CACHE):
        tarray, dt, n = bench.btm_phase(tel)
        np.savez(CACHE, tarray=np.asarray(tarray))
        print(f"BTM phase: {dt:.1f}s for {n} units; cached.")
        if mode == "btm":
            return

    tarray = np.load(CACHE)["tarray"]
    print("tarray:", tarray.shape, tarray.dtype)

    if mode == "prod":
        st = time.time()
        t = bench.product_phase(tel, tarray)
        print(f"product phase OK: {t:.2f}s (total {time.time()-st:.2f}s)")
        return

    if mode == "bisect":
        bisect(tel, tarray, bench)


def bisect(tel, tarray, bench):
    """Run the split product step stage by stage on the first m batch."""
    import jax
    import jax.numpy as jnp

    from driftscan_tpu.ops import linalg
    from driftscan_tpu.ops import zarray as za

    nl = tel.lmax + 1
    npol = tel.num_pol_sky
    cl_s, cl_n, noisew, npower = bench._covariances(tel)
    print("nl", nl, "npol", npol, "nfreq", tel.nfreq, "npairs", tel.npairs)

    mbatch = 1
    for m0 in [0, 1, 50, 100, 150, 200, tel.mmax]:
        beam, mv = bench._beam_batch(tarray, np.arange(m0, m0 + 1), tel, mbatch)
        b_re = np.ascontiguousarray(beam.real)
        b_im = np.ascontiguousarray(beam.imag)

        # stage 1: masked weight + triple SVD
        st = time.time()
        F = beam.shape[1]

        def stage1(bre, bim, mval):
            ls = jnp.arange(nl)
            lmask = (ls >= mval).astype(bre.dtype)
            tile = jnp.tile(lmask, npol)[None, None, :]
            bre = bre * tile
            bim = bim * tile
            bwre = bre * noisew[:, :, None]
            bwim = bim * noisew[:, :, None]
            return linalg.triple_svd_split_batched(
                bwre, bwim, npol=npol, nl=nl, polsvcut=1e-4
            )

        out = jax.jit(jax.vmap(stage1))(b_re, b_im, mv)
        ut_re, ut_im, bs_re, bs_im, sig, nmodes = [np.asarray(x) for x in out]
        print(
            f"m={m0}: svd ok ({time.time()-st:.2f}s), nmodes={nmodes},"
            f" sig range [{sig.min():.3g},{sig.max():.3g}],"
            f" finite={np.isfinite(sig).all()}"
        )

        # stage 2: covariance projection
        svcut = 1e-6
        sigmax = sig.max(axis=(1, 2), keepdims=True)
        svmask = (sig > sigmax * svcut).astype(np.float32)
        bs_re_m = bs_re * svmask[..., None]
        bs_im_m = bs_im * svmask[..., None]

        def proj(b4re, b4im, cl):
            Fq, S = b4re.shape[0], b4re.shape[1]
            b4re = b4re.reshape(Fq, S, npol, nl)
            b4im = b4im.reshape(Fq, S, npol, nl)
            t_re = jnp.einsum("fapl,pqlfg->faqlg", b4re, cl, optimize=True)
            t_im = jnp.einsum("fapl,pqlfg->faqlg", b4im, cl, optimize=True)
            t1 = za.Z(t_re, t_im)
            bc = za.Z(b4re, -b4im)
            mat = za.einsum("faqlg,gbql->fagb", t1, bc, optimize=True)
            return mat.re.reshape(Fq * S, Fq * S), mat.im.reshape(Fq * S, Fq * S)

        st = time.time()
        s_re, s_im = jax.jit(jax.vmap(lambda r, i: proj(r, i, cl_s)))(
            bs_re_m, bs_im_m
        )
        n_re, n_im = jax.jit(jax.vmap(lambda r, i: proj(r, i, cl_n)))(
            bs_re_m, bs_im_m
        )
        s_re, s_im, n_re, n_im = [np.asarray(x) for x in (s_re, s_im, n_re, n_im)]
        print(
            f"  proj ok ({time.time()-st:.2f}s): S range"
            f" [{np.abs(s_re).min():.3g},{np.abs(s_re).max():.3g}],"
            f" N max {np.abs(n_re).max():.3g},"
            f" finite={np.isfinite(s_re).all() and np.isfinite(n_re).all()}"
        )

        # stage 3: add noise + regulariser, whiten_eigh
        reg = 1e-14
        nmax = np.maximum(np.abs(n_re).max(axis=(1, 2)), np.abs(n_im).max(axis=(1, 2)))
        ndof = s_re.shape[1]
        eye = np.eye(ndof, dtype=np.float32)
        n_re2 = n_re + (reg * nmax)[:, None, None] * eye

        wp = npower * noisew**2
        ut_re_m = ut_re * svmask[..., None]
        ut_im_m = ut_im * svmask[..., None]

        def noiseblk(utre, utim, valid):
            Fq, S = utre.shape[0], utre.shape[1]
            ut = za.Z(utre, utim)
            xw = za.Z(ut.re * wp[:, None, :], ut.im * wp[:, None, :])
            blocks = za.einsum("fat,fbt->fab", xw, ut.conj())
            eyeF = jnp.eye(Fq, dtype=utre.dtype)
            nbre = (eyeF[:, None, :, None] * blocks.re[:, :, None, :]).reshape(
                Fq * S, Fq * S
            )
            nbim = (eyeF[:, None, :, None] * blocks.im[:, :, None, :]).reshape(
                Fq * S, Fq * S
            )
            nbre = nbre + jnp.diag(1.0 - valid)
            return nbre, nbim

        valid = svmask.reshape(mbatch, -1)
        nb_re, nb_im = jax.jit(jax.vmap(noiseblk))(ut_re_m, ut_im_m, valid)
        n_re3 = n_re2 + np.asarray(nb_re)
        n_im3 = n_im + np.asarray(nb_im)
        print(
            f"  noise ok: N diag range"
            f" [{np.diagonal(n_re3, axis1=1, axis2=2).min():.3g},"
            f"{np.diagonal(n_re3, axis1=1, axis2=2).max():.3g}]"
        )

        st = time.time()
        w, v, dmin = jax.jit(
            jax.vmap(lambda sr, si, nr, ni: za.whiten_eigh(za.Z(sr, si), za.Z(nr, ni)))
        )(s_re, s_im, n_re3, n_im3)
        w = np.asarray(w)
        print(
            f"  whiten_eigh ok ({time.time()-st:.2f}s): evals"
            f" [{w.min():.3g},{w.max():.3g}], dmin={np.asarray(dmin)},"
            f" finite={np.isfinite(w).all()}"
        )


if __name__ == "__main__":
    main()
