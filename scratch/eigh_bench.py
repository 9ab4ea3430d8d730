#!/usr/bin/env python
"""Raw eigh/matmul throughput on the accelerator, with honest fences."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(f, *args, n=3):
    out = f(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # sync
    best = np.inf
    for _i in range(n):
        st = time.time()
        out = f(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, time.time() - st)
    return best


def main():
    rng = np.random.default_rng(0)
    print("backend:", jax.default_backend(), flush=True)

    # matmul reference point
    for n in (704, 2048):
        a = jnp.asarray(rng.standard_normal((8, n, n)).astype(np.float32))
        f = jax.jit(lambda x: (x @ x).sum())
        dt = timeit(f, a)
        print(
            f"matmul batch8 n={n}: {dt*1e3:.1f} ms "
            f"({8*2*n**3/dt/1e12:.1f} TFLOP/s)",
            flush=True,
        )

    # eigh
    for dtype, n, b in [
        (np.float32, 704, 8),
        (np.float32, 704, 16),
        (np.float32, 352, 8),
        (np.float64, 704, 8),
    ]:
        a = rng.standard_normal((b, n, n)).astype(dtype)
        a = a + a.transpose(0, 2, 1)
        aj = jnp.asarray(a)
        f = jax.jit(lambda x: jnp.linalg.eigh(x)[0].sum())
        dt = timeit(f, aj)
        print(f"eigh {np.dtype(dtype).name} batch={b} n={n}: {dt*1e3:.1f} ms", flush=True)

    # the actual per-batch product step
    import bench
    from driftscan_tpu.parallel import mstep, resident

    tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    pos, neg = resident.btm_resident(tel, blg, fig)

    for mb in (8, 16):
        for fgl, sgl in ((8, 5), (6, 4), (5, 3)):
            st = time.time()
            resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, mbatch=mb, max_m=mb,
            )
            tc = time.time() - st
            st = time.time()
            resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, mbatch=mb, max_m=4 * mb,
            )
            dt = (time.time() - st) / 4
            print(
                f"product mbatch={mb} levels=({fgl},{sgl}): compile {tc:.1f}s,"
                f" {dt*1e3:.0f} ms/batch = {dt/mb*1e3:.1f} ms/m",
                flush=True,
            )
            break  # levels not yet plumbed through product_all_resident
        continue


if __name__ == "__main__":
    main()
