"""Stage-isolated timing of the QR product batch at stress scale (ndof 1088)."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import mstep, resident
from driftscan_tpu.ops import fpencil, linalg, zarray as za

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

tel = cylinder.UnpolarisedCylinderTelescope.from_config(dict(
    num_freq=16, freq_start=450.0, freq_end=500.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=16.0, num_feeds=12, feed_spacing=0.6,
    tsys=50.0, single_precision=True,
))
nm = tel.mmax + 1
ndof = tel.nfreq * min(tel.lmax + 1, 2 * tel.npairs)
MB = resident._auto_mbatch(tel)
print(f"large: nm={nm} nfb={tel.npairs*tel.nfreq} lmax={tel.lmax} ndof={ndof} mbatch={MB}", flush=True)

cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
st = time.time()
pos, neg = resident.btm_resident(tel, blg, fig)
_ = float(np.asarray(pos.re.sum()))
print(f"btm ready {time.time()-st:.1f}s", flush=True)
nl = tel.lmax + 1
nw = jnp.asarray(noisew, dtype=pos.re.dtype)
lsj = jnp.asarray(ls, dtype=pos.re.dtype)
lfj = jnp.asarray(lf, dtype=pos.re.dtype)
mv = jnp.asarray(np.arange(100, 100 + MB, dtype=np.int32))

def t(f, *a):
    out = f(*a)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = np.inf
    for _i in range(3):
        st = time.time()
        out = f(*a)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - st)
    return best * 1e3

npairs, nfreq = tel.npairs, tel.nfreq

def build(PR, PI, NR, NI, mvv):
    def build_one(m):
        p_re = jnp.take(PR, m, axis=-1); p_im = jnp.take(PI, m, axis=-1)
        midx = jnp.maximum(m - 1, 0)
        n_re = jnp.take(NR, midx, axis=-1); n_im = jnp.take(NI, midx, axis=-1)
        sign = jnp.where(m % 2 == 0, 1.0, -1.0).astype(p_re.dtype)
        use = (m > 0).astype(p_re.dtype)
        n_re = sign*use*n_re; n_im = -sign*use*n_im
        def org(x):
            return x.reshape(npairs, nfreq, nl).transpose(1, 0, 2)
        return (jnp.concatenate([org(p_re), org(n_re)], axis=1),
                jnp.concatenate([org(p_im), org(n_im)], axis=1))
    return jax.vmap(build_one)(mvv)

@jax.jit
def stage_build(PR, PI, NR, NI, mvv):
    br, bi = build(PR, PI, NR, NI, mvv)
    return br.sum() + bi.sum()

@jax.jit
def stage_svd(PR, PI, NR, NI, mvv):
    br, bi = build(PR, PI, NR, NI, mvv)
    def one_m(bm_re, bm_im, mval):
        lmask = (jnp.arange(nl) >= mval).astype(bm_re.dtype)[None, None, :]
        w = nw[:, :, None]
        return linalg.triple_svd_split_batched(bm_re*lmask*w, bm_im*lmask*w, npol=1, nl=nl, polsvcut=1e-4)
    out = jax.vmap(one_m)(br, bi, mvv)
    return out[4].sum()

def kl_partial(stop, sig_levels=2):
    @jax.jit
    def f(PR, PI, NR, NI, mvv):
        br, bi = build(PR, PI, NR, NI, mvv)
        def one_m(bm_re, bm_im, mval):
            lmask = (jnp.arange(nl) >= mval).astype(bm_re.dtype)[None, None, :]
            w = nw[:, :, None]
            ur, ui, bsr, bsi, sig, nm_ = linalg.triple_svd_split_batched(bm_re*lmask*w, bm_im*lmask*w, npol=1, nl=nl, polsvcut=1e-4)
            S = ur.shape[1]
            svmask = (sig > sig.max()*1e-6).astype(bm_re.dtype)
            bsvd = za.Z(bsr*svmask[:, :, None], bsi*svmask[:, :, None])
            F = bm_re.shape[0]
            b4 = bsvd.reshape(F, S, 1, nl)
            a_s = fpencil.beam_factor(b4, lsj)
            a_f = fpencil.beam_factor(b4, lfj)
            if stop == "factors":
                return a_s.re.sum() + a_f.re.sum()
            rows = fpencil._thermal_noise_rows(a_f, 1.0)
            aug = za.interleave(rows)
            r_e = jnp.linalg.qr(aug, mode="r")
            d = jnp.diagonal(r_e)
            r_e = r_e * jnp.where(d < 0, -1.0, 1.0)[:, None]
            if stop == "qr":
                return r_e.sum()
            y = fpencil._solve_tri_interleaved(r_e, a_s, adjoint=True)
            if stop == "solve":
                return y.re.sum()
            yb = fpencil.gram_bands(y, levels=sig_levels, band_rel=3e-2)
            if stop == "gram":
                return yb.s.sum()
            u, sy = fpencil._select_complete_basis(yb)
            if stop == "basis":
                return u.re.sum() + sy.sum()
            v = fpencil._solve_tri_interleaved(r_e, u, adjoint=False)
            return v.re.sum() + sy.sum()
        return jax.vmap(one_m)(br, bi, mvv).sum()
    return f

A = (pos.re, pos.im, neg.re, neg.im, mv)
print(f"build only:        {t(stage_build, *A):6.0f} ms", flush=True)
print(f"+ triple svd:      {t(stage_svd, *A):6.0f} ms", flush=True)
for stop in ("factors", "qr", "solve"):
    print(f"+ {stop:9s}:      {t(kl_partial(stop), *A):6.0f} ms", flush=True)
print(f"+ gram lv1:        {t(kl_partial('gram', 1), *A):6.0f} ms", flush=True)
print(f"+ gram lv2:        {t(kl_partial('gram', 2), *A):6.0f} ms", flush=True)
print(f"+ basis lv1:       {t(kl_partial('basis', 1), *A):6.0f} ms", flush=True)
print(f"+ full  lv1:       {t(kl_partial('full', 1), *A):6.0f} ms", flush=True)
print(f"+ full  lv2:       {t(kl_partial('full', 2), *A):6.0f} ms", flush=True)
