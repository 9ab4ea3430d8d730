"""eigh batch scaling + product-step mbatch sweep on the chip."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
import bench
from driftscan_tpu.parallel import mstep, resident

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
for b in (1, 8, 16, 32):
    a = rng.standard_normal((b, 704, 704)).astype(np.float32)
    a = a + a.transpose(0, 2, 1)
    f = jax.jit(lambda x: jnp.linalg.eigh(x)[0].sum())
    dt = timeit(f, jnp.asarray(a))
    print(f"eigh batch={b} n=704: {dt*1e3:.0f} ms ({dt/b*1e3:.1f} ms/matrix)", flush=True)

# QR batch scaling
for b in (8, 16, 32):
    a = rng.standard_normal((b, 4384, 704)).astype(np.float32)
    f = jax.jit(lambda x: jnp.linalg.qr(x, mode="r")[0].sum() if isinstance(jnp.linalg.qr(x, mode="r"), tuple) else jnp.linalg.qr(x, mode="r").sum())
    dt = timeit(f, jnp.asarray(a))
    print(f"qr batch={b} (4384,704): {dt*1e3:.0f} ms ({dt/b*1e3:.1f} ms/matrix)", flush=True)

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

for mb in (8, 16, 32):
    mv = jnp.asarray(np.arange(8, 8+mb, dtype=np.int32))
    f = functools.partial(resident._spectrum_batch, npairs=tel.npairs,
                          nfreq=tel.nfreq, nl=nl)
    st = time.time()
    ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
    np.asarray(ev); tc = time.time() - st
    best = np.inf
    for _ in range(3):
        st = time.time()
        ev, *_ = f(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)
        _ = float(np.asarray(ev).ravel()[0])
        best = min(best, time.time() - st)
    print(f"spectrum mbatch={mb}: compile {tc:.1f}s steady {best*1e3:.0f} ms ({best/mb*1e3:.1f} ms/m)", flush=True)
