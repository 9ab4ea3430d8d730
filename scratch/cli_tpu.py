#!/usr/bin/env python
"""Time the real file-based CLI pipeline on the TPU (VERDICT r2 item 6).

Runs ProductManager product generation (BTM -> beam.hdf5 -> SVD -> KL)
at the bench's mid-scale on the chip, stage-timed, and records
doc/cli_tpu.json so the resident-bench headline can be compared against
what `drift-makeproducts run` actually delivers.  CLI_SCALE=functional
runs the tiny functional config instead.

Participates in the one-client pidfile protocol like every chain step.
"""

import json
import logging
import os
import shutil
import sys
import time

logging.basicConfig(
    level=logging.INFO,
    format="%(relativeCreated)8.0fms %(name)s: %(message)s",
)

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("CLI_CPU"):  # flow check without the chip
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile  # script dir is sys.path[0]

    _tpu_pidfile.register()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.core import manager

T0 = time.time()


def log(msg):
    print(f"[cli +{time.time()-T0:7.1f}s] {msg}", flush=True)


SCALE = os.environ.get("CLI_SCALE", "mid")
OUTDIR = f"/tmp/cli_tpu_{SCALE}"

MID_CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           No
    output_directory:   "%(outdir)s"

telescope:
    type:               UnpolarisedCylinder
    num_freq:           8
    freq_start:         400.0
    freq_end:           450.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     12.0
    num_feeds:          8
    feed_spacing:       0.6
    tsys:               50.0
    single_precision:   Yes

kltransform:
    -   type:           KLTransform
        name:           kl
        use_thermal:    Yes
        use_foregrounds: Yes
"""

FUNCTIONAL_CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           No
    output_directory:   "%(outdir)s"
    polsvcut:           1.0

telescope:
    type:               PolarisedCylinder
    num_freq:           4
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0

kltransform:
    -   type:           KLTransform
        name:           kl
        use_thermal:    Yes
        use_foregrounds: No
"""


def main():
    # engine + precision picks, same adoption rule as the bench
    eng = bench._engine_defaults()
    log(f"engine defaults: {eng}")

    shutil.rmtree(OUTDIR, ignore_errors=True)
    cfile = OUTDIR + ".yaml"
    tmpl = MID_CONFIG if SCALE == "mid" else FUNCTIONAL_CONFIG
    with open(cfile, "w") as f:
        f.write(tmpl % {"outdir": OUTDIR})

    st = time.time()
    m = manager.ProductManager.from_config(cfile)
    t_init = time.time() - st
    tel = m.telescope
    nm = tel.mmax + 1
    log(
        f"manager ready ({t_init:.1f}s): nm={nm} "
        f"nfb={tel.npairs * tel.nfreq} npol={tel.num_pol_sky}"
    )

    def one_pass(mgr):
        st = time.time()
        mgr.beamtransfer.generate()
        t_bt = time.time() - st
        st = time.time()
        for kl in mgr.kltransforms.values():
            kl.generate()
        t_kl = time.time() - st
        return t_bt, t_kl

    t_bt, t_kl = one_pass(m)
    resident_used = m.beamtransfer._mem_beam is not None
    log(f"cold pass: beamtransfer {t_bt:.1f}s (resident={resident_used}), "
        f"kl {t_kl:.1f}s")

    # Warm pass: fresh products, hot compile caches — the honest
    # comparable to the bench's steady-state phase walls.
    shutil.rmtree(OUTDIR, ignore_errors=True)
    m2 = manager.ProductManager.from_config(cfile)
    t_bt_w, t_kl_w = one_pass(m2)
    log(f"warm pass: beamtransfer {t_bt_w:.1f}s, kl {t_kl_w:.1f}s")

    total = t_bt + t_kl
    total_w = t_bt_w + t_kl_w
    rec = {
        "scale": SCALE,
        "nm": int(nm),
        "nfb": int(tel.npairs * tel.nfreq),
        "npol": int(tel.num_pol_sky),
        "platform": jax.devices()[0].platform,
        "resident_path": bool(resident_used),
        "engine": eng,
        "t_manager_init_s": round(t_init, 2),
        "t_beamtransfer_s": round(t_bt, 2),
        "t_kl_s": round(t_kl, 2),
        "t_total_s": round(total, 2),
        "cli_m_per_s": round(nm / total, 3),
        "t_beamtransfer_warm_s": round(t_bt_w, 2),
        "t_kl_warm_s": round(t_kl_w, 2),
        "t_total_warm_s": round(total_w, 2),
        "cli_m_per_s_warm": round(nm / total_w, 3),
    }
    path = "/root/repo/doc/cli_tpu.json" if SCALE == "mid" else \
        "/root/repo/doc/cli_tpu_functional.json"
    if os.environ.get("CLI_CPU"):
        path += ".cpu"
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    log(f"record written to {path}: {rec}")


if __name__ == "__main__":
    main()
