"""Prototype: factor-side QR whitening in f32 vs dense f64 pencil solve.

Synthetic matrices mimicking bench-scale conditioning: A_f with singular
values spanning 5.6e5 .. 1e-3 (14 eigenvalue decades), A_s ~ 0.3.
"""
import numpy as np
import scipy.linalg as sla

rng = np.random.default_rng(0)
n, Kf, Ks = 352, 1840, 1840

def rand_unitary(p, q):
    a = rng.standard_normal((p, q)) + 1j * rng.standard_normal((p, q))
    q_, _ = np.linalg.qr(a)
    return q_

# foreground factor: continuous log-spaced spectrum
sf = np.logspace(np.log10(5.6e5), -3, n)
Af = (rand_unitary(n, n) * sf) @ rand_unitary(Kf, n).conj().T
# signal factor, norm ~0.3, random alignment
ss = 0.3 * np.logspace(0, -3, n)
As = (rand_unitary(n, n) * ss) @ rand_unitary(Ks, n).conj().T

# ---- reference: dense f64 pencil ----
S = As @ As.conj().T
N = Af @ Af.conj().T + np.eye(n)
w_ref = sla.eigh(S, N, eigvals_only=True)

# ---- f32 QR whitening ----
def interleave(M):
    p, q = M.shape
    out = np.zeros((2*p, 2*q), M.real.dtype)
    out[0::2, 0::2] = M.real; out[0::2, 1::2] = -M.imag
    out[1::2, 0::2] = M.imag; out[1::2, 1::2] = M.real
    return out

def deinterleave(E):
    return E[0::2, 0::2] + 1j * E[1::2, 0::2]

Af32 = Af.astype(np.complex64)
As32 = As.astype(np.complex64)
aug = np.concatenate([interleave(Af32.conj().T.astype(np.complex64)),
                      np.eye(2*n, dtype=np.float32)], axis=0)
R = np.linalg.qr(aug, mode='r')
R = (np.sign(np.diag(R)) + (np.diag(R) == 0))[:, None] * R
# R should be E_i(R_c): check structure
Rc = deinterleave(R)
err_embed = np.abs(interleave(Rc) - R).max() / np.abs(R).max()
print("embedding structure error:", err_embed)

# y = R_c^-H As  (solve R_c^H y = As; R_c^H is lower)
y = sla.solve_triangular(Rc.conj().T.astype(np.complex64), As32, lower=True)
G = (y @ y.conj().T).astype(np.complex64)
w32, U = np.linalg.eigh(G.astype(np.complex64))
w32 = w32[::-1]

w_ref_d = np.sort(w_ref)[::-1]
for k in (1, 4, 16, 64):
    rel = abs(w32[k-1] / w_ref_d[k-1] - 1)
    print(f"top-{k}: f32qr {w32[k-1]:.6e} ref {w_ref_d[k-1]:.6e} rel {rel:.2e}")

# eigenvector check: N-orthonormality + Rayleigh quotient
v = sla.solve_triangular(Rc.astype(np.complex64), U[:, ::-1][:, :4], lower=False)
for j in range(3):
    vv = v[:, j].astype(np.complex128)
    rq = np.real(vv.conj() @ S @ vv) / np.real(vv.conj() @ N @ vv)
    print(f"mode {j}: w32 {w32[j]:.6e} RQ(f64) {rq:.6e} rel {abs(w32[j]/rq-1):.2e}")
