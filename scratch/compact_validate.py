"""Validate the compacted signal factor at true north-star conditioning.

Uses the cached 256-freq covariance factors and a synthetic (random,
band-limit-masked) SVD beam; solves one m's pencil three ways on CPU:
wide factored QR path, compacted-signal QR path, dense f64 reference.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from driftscan_tpu.ops import fpencil, zarray as za

z = np.load("/root/repo/.cache/ns_cov_cache.npz")
ls, lf = z["ls"], z["lf"]  # (nl, npol, F, K)
nl, npol, F, Ks = ls.shape
Kf = lf.shape[-1]
S_kl = 8
n = F * S_kl
print(f"nl={nl} npol={npol} F={F} Ks={Ks} Kf={Kf} n={n}", flush=True)

rng = np.random.default_rng(7)
m = 150  # mid-band m
b = rng.standard_normal((F, S_kl, npol, nl)) + 1j * rng.standard_normal(
    (F, S_kl, npol, nl)
)
b *= 1.0 / np.sqrt(nl)
b[..., :m] = 0.0  # band-limit mask l >= m
bz = za.Z(
    jnp.asarray(b.real, jnp.float32), jnp.asarray(b.imag, jnp.float32)
)

t0 = time.time()
a_f = fpencil.beam_factor(bz, jnp.asarray(lf, jnp.float32))
a_s_c = fpencil.beam_factor_compact(bz, jnp.asarray(ls, jnp.float32))
ev_c = np.asarray(fpencil.kl_solve_qr(a_s_c, a_f).evals, np.float64)
print(f"compact path {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
a_s_w = fpencil.beam_factor(bz, jnp.asarray(ls, jnp.float32))
ev_w = np.asarray(fpencil.kl_solve_qr(a_s_w, a_f).evals, np.float64)
print(f"wide path {time.time()-t0:.0f}s", flush=True)

# dense f64 reference
t0 = time.time()
b64 = b.astype(np.complex128)
af64 = np.einsum("fapl,lpfk->falk", b64, lf.astype(np.float64)).reshape(n, -1)
as64 = np.einsum("fapl,lpfk->falk", b64, ls.astype(np.float64)).reshape(n, -1)
ev_ref, _ = fpencil.kl_solve_dense_ref(as64, af64, with_thermal=True)
print(f"dense ref {time.time()-t0:.0f}s", flush=True)

e = np.sort(ev_ref)[::-1]
for name, ev in (("wide", np.sort(ev_w)[::-1]), ("compact", np.sort(ev_c)[::-1])):
    for k in (1, 8, 32, 128):
        rel = abs(ev[k-1] - e[k-1]) / max(abs(e[k-1]), 1e-30)
        print(f"{name}: eval#{k} ref={e[k-1]:.6g} got={ev[k-1]:.6g} rel={rel:.2e}", flush=True)
nref = int((e > 0.1).sum())
nc = int((np.sort(ev_c)[::-1] > 0.1).sum())
nw = int((np.sort(ev_w)[::-1] > 0.1).sum())
print(f"retained(>0.1): ref={nref} wide={nw} compact={nc}", flush=True)
