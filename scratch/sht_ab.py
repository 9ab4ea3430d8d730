#!/usr/bin/env python
"""A/B the SHT phase/Legendre matmul precision on the TPU.

The split-path contractions are the BTM phase's FLOP bulk; "high"
(bf16x3) halves the MXU passes of the library's "highest" (bf16x6)
default.  The flip is accuracy-gated twice:

* BTM agreement: max|delta| / max|ref| over the (re, im) planes of the
  positive and negative blocks must stay <= 1e-5 (10x inside the
  reference's beam_m tier, tests/test_functional.py:29-31);
* downstream agreement: the exact-engine retained KL spectrum from the
  "high" BTMs must match the "highest" one to 1e-4 with equal retained
  sets (the foreground-whitening path is the precision-sensitive
  consumer, not the beam maps themselves).

Writes doc/sht_ab.json; bench.py and the north-star run adopt the pick
(env DRIFTSCAN_TPU_SHT_PRECISION always overrides).  STRESS=1 uses the
ndof-1088 production-stress telescope; AB_CPU=1 flow-checks on CPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("AB_CPU"):  # flow check without the chip
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile  # script dir is sys.path[0]

    _tpu_pidfile.register()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.ops import sht
from driftscan_tpu.parallel import mstep, resident


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def btm_host(tel, blg, fig, reps=3):
    """Warm pass + best-of-``reps`` fetch-timed BTM passes; planes to host.

    Best-of-3, not a single pass: this timing decides a production
    default via a 5% threshold, and single-pass host-load jitter on
    this box has been measured at that order.
    """
    pos, neg = resident.btm_resident(tel, blg, fig)
    fetch(pos.re)
    dt = np.inf
    for _ in range(reps):
        st = time.time()
        pos, neg = resident.btm_resident(tel, blg, fig)
        fetch(pos.re)
        dt = min(dt, time.time() - st)
    out = tuple(np.asarray(p) for p in (pos.re, pos.im, neg.re, neg.im))
    del pos, neg
    return out, dt


def main():
    if os.environ.get("STRESS"):
        from driftscan_tpu.telescope import cylinder

        tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
            num_freq=16, freq_start=400.0, freq_end=500.0, freq_mode="edge",
            num_cylinders=2, cylinder_width=15.0, num_feeds=4,
            feed_spacing=3.0, tsys=50.0, single_precision=True,
        ))
    else:
        tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    print(f"telescope: nfreq={tel.nfreq} mmax={tel.mmax} "
          f"npairs={tel.npairs}", flush=True)

    rec = dict(scale="stress" if os.environ.get("STRESS") else bench.SCALE,
               mmax=int(tel.mmax))
    planes = {}
    evs = {}
    for prec in (None, "high"):
        sht._SHT_PRECISION = prec
        jax.clear_caches()  # precision is trace-time module state
        (pr, pi, nr, ni), dt = btm_host(tel, blg, fig)
        key = str(prec)
        rec[f"t_btm_{key}_s"] = round(dt, 2)
        planes[key] = (pr, pi, nr, ni)
        # downstream: exact-engine retained KL spectrum from these BTMs
        import jax.numpy as jnp
        from driftscan_tpu.ops import zarray as za

        pos = za.Z(jnp.asarray(pr), jnp.asarray(pi))
        neg = za.Z(jnp.asarray(nr), jnp.asarray(ni))
        ev, _ = resident.product_all_resident(tel, pos, neg, ls, lf, noisew)
        evs[key] = np.asarray(ev)
        del pos, neg
        print(f"prec={prec}: btm {dt:.2f}s, retained "
              f"{int((evs[key] > 0.1).sum())}", flush=True)
    sht._SHT_PRECISION = None
    jax.clear_caches()

    ref, alt = planes["None"], planes["high"]
    btm_rel = max(
        float(np.abs(a - r).max() / (np.abs(r).max() + 1e-300))
        for r, a in zip(ref, alt)
    )
    ev0, ev1 = evs["None"], evs["high"]
    keep = ev0 > 0.1
    sets_equal = bool(np.array_equal(keep, ev1 > 0.1))
    kl_rel = float((np.abs(ev1[keep] - ev0[keep]) / ev0[keep]).max()) \
        if keep.any() else 0.0
    wins = bool(
        btm_rel <= 1e-5 and sets_equal and kl_rel <= 1e-4
        and rec["t_btm_high_s"] < 0.95 * rec["t_btm_None_s"]
    )
    rec.update(btm_rel=btm_rel, sets_equal=sets_equal, kl_rel=kl_rel,
               sht_precision_pick="high" if wins else None)
    print(f"btm_rel={btm_rel:.2e} sets_equal={sets_equal} "
          f"kl_rel={kl_rel:.2e} -> pick={rec['sht_precision_pick']}",
          flush=True)
    path = "/root/repo/doc/sht_ab.json"
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"decision record written to {path}", flush=True)


if __name__ == "__main__":
    main()
