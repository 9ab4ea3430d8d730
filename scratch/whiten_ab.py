#!/usr/bin/env python
"""On-chip A/B: whitening by tall triangular solves vs factored inverses.

The exact engine's stage profile (doc/exact_profile.json) puts the tall
triangular solve R^-H A_s at ~98 ms/m — ~1/3 of the product step —
because XLA's blocked triangular solve is panel-sequential on the TPU.
``fpencil._WHITEN_IMPL = "refined"`` applies the same whitening as a
chain of per-round explicit CholeskyQR factor inverses (every factor is
shift-capped at cond ~ sqrt(1/shift_rel), so each inversion is stable)
plus two residual-correction steps that pin the result to the solve
path's target — worst deviation 3e-5 on the real bench pencil
(scratch/whiten_localize.py; dense-referee coverage in
tests/test_fpencil.py::TestFactoredWhitening).

Times the full product phase at bench scale under both impls with the
bench's adopted (mbatch, sig_levels), gates on retained-spectrum
equality at the 1e-4 tier, and writes doc/whiten_ab.json.  The bench
adopts the pick via _engine_defaults (DRIFTSCAN_TPU_WHITEN_IMPL env
always wins).
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
from driftscan_tpu.ops import fpencil
from driftscan_tpu.parallel import mstep, resident

CUT = 0.1  # KL retention threshold the spectrum is consumed at


def main():
    tel = bench.build_telescope()
    bench._engine_defaults()
    mb, sig_levels, _qr = bench._mbatch_default()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl, fi = np.arange(tel.npairs), np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig)
    float(np.asarray(pos.re.sum()))
    print(f"btm {time.time() - st:.0f}s", flush=True)

    nm = tel.mmax + 1
    cap = int(os.environ.get("AB_MAXM", "0"))
    if cap:  # flow-check cap; also shrinks the warm batch
        nm = min(nm, cap)
        mb = min(mb, nm)
    kw = dict(mbatch=mb, max_m=nm)
    if sig_levels:
        kw["sig_levels"] = sig_levels
    rec = {
        "scale": "bench",
        "nm": nm,
        "mbatch": mb,
        "sig_levels": sig_levels,
        "qr_impl": fpencil._QR_IMPL,
        "impls": {},
    }
    ref = None
    results = {}
    for impl in ("solve", "refined"):
        prev = fpencil._WHITEN_IMPL
        fpencil._WHITEN_IMPL = impl
        resident._spectrum_batch.clear_cache()
        try:
            t0 = time.time()
            resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew,
                **{**kw, "max_m": min(mb, nm)},
            )
            warm = time.time() - t0
            t0 = time.time()
            evals, nmodes = resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, **kw
            )
            dt = time.time() - t0
        finally:
            fpencil._WHITEN_IMPL = prev
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
        results[impl] = (dt, ok)
        rec["impls"][impl] = {
            "t_s": round(dt, 2),
            "warm_s": round(warm, 2),
            "rel": rel,
            "sets_equal": sets_equal,
            "ok": ok,
        }
        print(
            f"whiten={impl}: {dt:.2f}s (warm {warm:.1f}s) rel={rel:.2e} "
            f"sets_equal={sets_equal} ok={ok}",
            flush=True,
        )

    pick = "solve"
    if (
        results.get("refined", (np.inf, False))[1]
        and results["refined"][0] < results["solve"][0]
    ):
        pick = "refined"
    rec["whiten_pick"] = pick
    path = "/root/repo/doc/whiten_ab.json"
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"whiten_pick={pick}; decision record written to {path}", flush=True)


if __name__ == "__main__":
    main()
