"""Probe: factored whitening + one iterative-refinement step vs solve.

Measures operator accuracy of y = R^-H A_s on the bench-conditioning
synthetic pencil (cond(N) ~ 3e11 and harder), comparing
  solve      — triangular solve against R_total (current default)
  factored   — chain of per-round factor inverses
  refined    — factored + one residual correction through R_total
against an f64 dense reference.
"""
import os, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from driftscan_tpu.ops import fpencil, zarray as za

rng = np.random.default_rng(3)


def rand_u(p, q):
    a = rng.standard_normal((p, q)) + 1j * rng.standard_normal((p, q))
    return np.linalg.qr(a)[0]


def hard_pencil(n=96, kf=288, ks=288, fg_top=5.6e5):
    sf = np.logspace(np.log10(fg_top), -3, n)
    a_f = (rand_u(n, n) * sf) @ rand_u(kf, n).conj().T
    ss = 0.3 * np.logspace(0, -3, n)
    a_s = (rand_u(n, n) * ss) @ rand_u(ks, n).conj().T
    return a_s, a_f


def split32(a):
    return za.Z(jnp.asarray(a.real, jnp.float32), jnp.asarray(a.imag, jnp.float32))


for fg_top in (5.6e5, 5.6e7, 5.6e8):
    a_s, a_f = hard_pencil(fg_top=fg_top)
    n = a_s.shape[0]
    rows = fpencil._thermal_noise_rows(split32(a_f), 1.0)

    # f64 reference: y = R^-H A_s with R from f64 Cholesky of N
    N = a_f @ a_f.conj().T + np.eye(n)
    L = np.linalg.cholesky(N)
    y_ref = np.linalg.solve(L, a_s)  # L^-1 A_s = R^-H A_s with R = L^H
    ev_ref = np.linalg.eigvalsh(y_ref @ y_ref.conj().T)[::-1]

    a_s32 = split32(a_s)

    @jax.jit
    def run(rows, a_s32):
        r_e, invs = fpencil._chol_qr_r_split(rows, return_inv=True)
        y_solve = fpencil._solve_tri_interleaved(r_e, a_s32, adjoint=True)
        y_fac = fpencil._whiten_apply_factors(invs, a_s32, adjoint=True)
        # one refinement: r = b - R^H y ; y += M r  (R^H y via matmul)
        def rh_mul(y):
            ye = za.interleave(y)
            return za.deinterleave(jnp.swapaxes(r_e, -1, -2) @ ye)
        res = a_s32 - rh_mul(y_fac)
        y_ref1 = y_fac + fpencil._whiten_apply_factors(invs, res, adjoint=True)
        return y_solve, y_fac, y_ref1

    y_solve, y_fac, y_ref1 = run(rows, a_s32)

    def evals(y):
        yc = (np.asarray(y.re, np.float64) + 1j * np.asarray(y.im, np.float64))
        return np.linalg.eigvalsh(yc @ yc.conj().T)[::-1]

    ret = ev_ref > 0.1
    k = max(int(ret.sum()), 5)
    for name, y in (("solve", y_solve), ("factored", y_fac), ("refined", y_ref1)):
        ev = evals(y)
        rel = np.abs(ev[:k] / ev_ref[:k] - 1).max()
        print(f"fg_top={fg_top:.1e} {name:9s} top-{k} rel={rel:.2e}")
    print()
