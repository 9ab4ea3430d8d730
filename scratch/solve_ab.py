"""A/B: triangular solve vs inverse+matmul; sig_levels=2 accuracy at low m."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.parallel import mstep, resident
from driftscan_tpu.ops import fpencil, zarray as za

def timeit(f, *args, n=3):
    out = f(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    best = np.inf
    for _i in range(n):
        st = time.time()
        out = f(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - st)
    return best

rng = np.random.default_rng(0)
B, n2, k2 = 8, 704, 3680
R = np.triu(rng.standard_normal((B, n2, n2)).astype(np.float32)) + 5*np.eye(n2, dtype=np.float32)
A = rng.standard_normal((B, n2, k2)).astype(np.float32)
Rj, Aj = jnp.asarray(R), jnp.asarray(A)

f1 = jax.jit(lambda r, a: jax.scipy.linalg.solve_triangular(jnp.swapaxes(r,-1,-2), a, lower=True).sum())
print(f"solve_triangular (704x3680, b8): {timeit(f1, Rj, Aj)*1e3:.0f} ms", flush=True)

def inv_then_mm(r, a):
    eye = jnp.broadcast_to(jnp.eye(n2, dtype=r.dtype), r.shape)
    rinv = jax.scipy.linalg.solve_triangular(r, eye, lower=False)
    return (jnp.swapaxes(rinv, -1, -2) @ a).sum()
f2 = jax.jit(inv_then_mm)
print(f"inv+matmul: {timeit(f2, Rj, Aj)*1e3:.0f} ms", flush=True)

# low-m accuracy: sig2 vs sig3 vs dense anchor at m=0..7
tel = bench.build_telescope()
cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
pos, neg = resident.btm_resident(tel, blg, fig)
nl = tel.lmax + 1
nw = jnp.asarray(noisew, dtype=pos.re.dtype)
lsj = jnp.asarray(ls, dtype=pos.re.dtype)
lfj = jnp.asarray(lf, dtype=pos.re.dtype)
mv = jnp.asarray(np.arange(0, 8, dtype=np.int32))
f = functools.partial(resident._spectrum_batch, npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
ev3, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
ev2, _ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv, sig_levels=2)
ev3, ev2 = np.asarray(ev3), np.asarray(ev2)
rel = np.abs(np.sort(ev2,-1)[:, ::-1][:, :64] / np.maximum(np.sort(ev3,-1)[:, ::-1][:, :64], 1e-30) - 1)
print(f"low-m sig2 vs sig3 top64: max rel {rel.max():.2e}", flush=True)
print("top evals per m:", np.sort(ev3,-1)[:, -1], flush=True)

# dense anchor m=0
res = resident._resident_batch(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
                               npairs=tel.npairs, nfreq=tel.nfreq, nl=nl)
bs = np.asarray(res.beam_re) + 1j*np.asarray(res.beam_im)
F, S = bs.shape[1], bs.shape[2]
for i in (0, 1):
    b4 = za.Z(jnp.asarray(bs[i].real.reshape(F,S,1,nl)), jnp.asarray(bs[i].imag.reshape(F,S,1,nl)))
    zs = fpencil.beam_factor(b4, lsj); zf = fpencil.beam_factor(b4, lfj)
    a_s = (np.asarray(zs.re) + 1j*np.asarray(zs.im)).astype(np.complex128)
    a_f = (np.asarray(zf.re) + 1j*np.asarray(zf.im)).astype(np.complex128)
    evd, _ = fpencil.kl_solve_dense_ref(a_s, a_f)
    e = np.sort(evd)[::-1][:32]; c = np.sort(ev3[i])[::-1][:32]
    print(f"m={i}: engine vs dense top32 max rel {np.abs(c/e-1).max():.2e} (top {e[0]:.3e})", flush=True)
