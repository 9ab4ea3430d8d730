#!/usr/bin/env python
"""Sweep the product-phase m-batch size on chip (dispatch-latency A/B).

The bench's product phase issues nm/mbatch host-driven dispatches over
the tunnel; resident._auto_mbatch caps mbatch at 8 even when HBM would
allow far more (bench scale: ~53 MB/m against a 4 GB budget).  If the
tunnel's per-dispatch round-trip is a material fraction of the batch
compute, larger batches lift the headline directly.

Times product_all_resident at mbatch in {8, 16, 32, 64} at bench scale,
measures the bare dispatch round-trip, gates on retained-spectrum
equality, and writes doc/mbatch_ab.json.  The bench adopts the fastest
accuracy-equal pick for its primary headline (BENCH_MBATCH env wins).
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("AB_CPU"):  # flow check without the chip
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile  # script dir is sys.path[0]

    _tpu_pidfile.register()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.parallel import mstep, resident

CUT = 0.1  # KL retention threshold the spectrum is consumed at


def main():
    tel = bench.build_telescope()
    bench._engine_defaults()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl, fi = np.arange(tel.npairs), np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig)
    float(np.asarray(pos.re.sum()))
    print(f"btm {time.time() - st:.0f}s", flush=True)

    # bare dispatch round-trip: tiny jit + scalar fetch
    f = jax.jit(lambda x: (x * 2).sum())
    float(np.asarray(f(jnp.ones(8, jnp.float32))))
    rtts = []
    for _ in range(20):
        t0 = time.time()
        float(np.asarray(f(jnp.ones(8, jnp.float32))))
        rtts.append(time.time() - t0)
    rtt_ms = float(np.median(rtts)) * 1e3
    print(f"dispatch RTT median {rtt_ms:.1f} ms", flush=True)

    nm = tel.mmax + 1
    rec = {
        "scale": "bench",
        "nm": nm,
        "dispatch_rtt_ms": round(rtt_ms, 2),
        "sweep": {},
    }
    ref = None
    best_mb, best_t = None, np.inf
    for mb in (8, 16, 32, 64):
        t0 = time.time()
        resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, mbatch=mb, max_m=min(mb, nm)
        )
        warm = time.time() - t0
        t0 = time.time()
        evals, nmodes = resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, mbatch=mb
        )
        dt = time.time() - t0
        if ref is None:
            ref = evals
            sets_equal, rel = True, 0.0
        else:
            sets_equal = bool(((evals > CUT) == (ref > CUT)).all())
            ret = ref > CUT
            denom = max(float(np.abs(ref[ret]).max()), 1e-30) if ret.any() else 1.0
            rel = (
                float(np.abs((evals - ref)[ret]).max() / denom)
                if ret.any()
                else 0.0
            )
        ok = sets_equal and rel <= 1e-4 and bool(np.isfinite(evals).all())
        rec["sweep"][str(mb)] = {
            "t_s": round(dt, 2),
            "warm_s": round(warm, 2),
            "rel": rel,
            "sets_equal": sets_equal,
            "ok": ok,
        }
        print(
            f"mbatch={mb}: {dt:.2f}s (warm {warm:.1f}s) rel={rel:.2e} "
            f"sets_equal={sets_equal} ok={ok}",
            flush=True,
        )
        if ok and dt < best_t:
            best_mb, best_t = mb, dt
    rec["mbatch_pick"] = best_mb
    path = "/root/repo/doc/mbatch_ab.json"
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"decision record written to {path}", flush=True)


if __name__ == "__main__":
    main()
