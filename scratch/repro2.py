#!/usr/bin/env python
"""Find which m faults the TPU product step, then dump its inputs."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

CACHE = "/root/repo/scratch/tarray.npz"


def main():
    import bench
    import jax

    tel = bench.build_telescope()
    if not os.path.exists(CACHE):
        tarray, dt, n = bench.btm_phase(tel)
        np.savez(CACHE, tarray=np.asarray(tarray))
        print(f"BTM phase: {dt:.1f}s for {n} units; cached.", flush=True)
    tarray = np.load(CACHE)["tarray"]

    from driftscan_tpu.parallel import mstep

    nl = tel.lmax + 1
    npol = tel.num_pol_sky
    nm = tel.mmax + 1
    cl_s, cl_n, noisew, npower = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    print(
        f"nm={nm} nl={nl} ls scale={np.abs(ls).max():.3g} "
        f"lf scale={np.abs(lf).max():.3g} noisew={noisew.min():.3g}..{noisew.max():.3g}",
        flush=True,
    )

    step = mstep.jit_product_step_split(npol=npol, nl=nl)

    mbatch = 1
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else nm
    for m0 in range(lo, hi, mbatch):
        ms = np.arange(m0, min(m0 + mbatch, nm))
        beam, mv = bench._beam_batch(tarray, ms, tel, mbatch)
        try:
            st = time.time()
            res = step(
                np.ascontiguousarray(beam.real),
                np.ascontiguousarray(beam.imag),
                noisew,
                ls,
                lf,
                mv,
            )
            ev = np.asarray(res.evals)
            ok = np.isfinite(ev).all()
            print(
                f"m={m0}: ok={ok} ev[{ev.min():.3g},{ev.max():.3g}]"
                f" ({time.time()-st:.2f}s)",
                flush=True,
            )
            if not ok:
                np.savez(f"/root/repo/scratch/badm_{m0}.npz", beam=beam, mv=mv)
        except Exception as e:
            print(f"m={m0}: FAULT {type(e).__name__}", flush=True)
            np.savez(f"/root/repo/scratch/badm_{m0}.npz", beam=beam, mv=mv)
            break


if __name__ == "__main__":
    main()
