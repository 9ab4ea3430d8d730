"""Reduced m-window A/B: windowed vs full-range, no bucketing.

ns_referee_probe.py saw the windowed+bucketed engine retain modes
(0.21 top eval at nfreq=32) where the dense complex128 referee says
~1e-6.  The full A/B (ns_window_ab.py) drowned in CPU compiles of the
bucketed variants, so this probe removes bucketing entirely and tests
the three candidate fault sites directly on one m:

  1. TABLE: windowed btm_resident column 0 vs full-range column m
     (pure numpy — pinpoints SHT/table-layout windowing),
  2. STEP: _spectrum_batch(m_lo=None, full tables) vs
     _spectrum_batch(m_lo=m0, windowed tables) — the product
     addressing, one full-shape compile each,
  3. TRUTH: dense complex128 pencil from the legacy-built beams
     (negative-m block included).
"""
import json, os, sys, time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import scipy.linalg as sla

import bench
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.parallel import mstep, resident

T0 = time.time()


def log(msg):
    print(f"[winab2 +{time.time()-T0:6.1f}s] {msg}", flush=True)


NF = int(os.environ.get("WINAB_NF", "32"))
M = int(os.environ.get("WINAB_M", "40"))

tel = cylinder.UnpolarisedCylinderTelescope.from_config(dict(
    num_freq=NF, freq_start=400.0, freq_end=800.0, freq_mode="edge",
    num_cylinders=2, cylinder_width=3.0, num_feeds=1,
    feed_spacing=6.0, tsys=50.0, single_precision=True,
))
cl_s, cl_n, noisew, _ = bench._covariances(tel)
ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
bl = np.arange(tel.npairs)
fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
nl = tel.lmax + 1
npol = tel.num_pol_sky
F = tel.nfreq
log(f"tel: nfreq={F} lmax={tel.lmax} npairs={tel.npairs} m={M}")

posf, negf = resident.btm_resident(tel, blg, fig)
log("full tables done")
posw, negw = resident.btm_resident(tel, blg, fig, m_range=(M, M + 1))
log("windowed tables done")

# --- 1. table comparison (free) ---
out = dict(nfreq=NF, m=M, lmax=tel.lmax)


def relmax(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    den = max(np.abs(b).max(), 1e-30)
    return float(np.abs(a - b).max() / den)


# full layout: pos col m <-> m; neg col j <-> m = j+1 (legacy)
# windowed layout: both planes col j <-> m = M + j
out["table_pos_rel"] = relmax(
    posw.re[..., 0] + 1j * 0, posf.re[..., M]
)
out["table_pos_rel_im"] = relmax(posw.im[..., 0], posf.im[..., M])
out["table_neg_rel"] = relmax(negw.re[..., 0], negf.re[..., M - 1])
out["table_neg_rel_im"] = relmax(negw.im[..., 0], negf.im[..., M - 1])
log(f"table rel: pos {out['table_pos_rel']:.2e}/{out['table_pos_rel_im']:.2e} "
    f"neg {out['table_neg_rel']:.2e}/{out['table_neg_rel_im']:.2e}")

nw = jnp.asarray(np.asarray(noisew), posf.re.dtype)
mv = jnp.asarray(np.array([M], np.int32))

# --- 2. step comparison (one compile each) ---
evA, nmoA, okA = resident._spectrum_batch(
    posf.re, posf.im, negf.re, negf.im, nw, ls, lf, mv,
    npairs=tel.npairs, nfreq=F, nl=nl, npol=npol, sig_levels=2,
)
evA = np.sort(np.asarray(evA)[0])
log(f"A full-range step top3 {evA[-3:]}")

evB, nmoB, okB = resident._spectrum_batch(
    posw.re, posw.im, negw.re, negw.im, nw, ls, lf, mv,
    npairs=tel.npairs, nfreq=F, nl=nl, npol=npol, sig_levels=2,
    m_lo=np.int32(M),
)
evB = np.sort(np.asarray(evB)[0])
log(f"B windowed   step top3 {evB[-3:]}")

# --- 3. dense truth from legacy-built beams ---
beams_re, beams_im = resident._build_beam_batch(
    posf.re, posf.im, negf.re, negf.im, mv, tel.npairs, F, npol, nl
)
bs = (np.asarray(beams_re) + 1j * np.asarray(beams_im))[0]
# apply the engine's noise weighting: _spectrum_batch weights rows
bs = bs * np.asarray(noisew)[:, :, None]
bs = bs.reshape(F, -1, npol, nl)
S_ = bs.shape[1]
n = F * S_
csl = np.asarray(cl_s, np.float64).reshape(nl, F, F)
cnl = np.asarray(cl_n, np.float64).reshape(nl, F, F)
b = bs[:, :, 0, :].astype(np.complex128)
S_d = np.einsum("fal,lfg,gbl->fagb", b, csl, b.conj(), optimize=True)
N_d = np.einsum("fal,lfg,gbl->fagb", b, cnl, b.conj(), optimize=True)
S_d = S_d.reshape(n, n)
N_d = N_d.reshape(n, n) + np.eye(n)
S_d = 0.5 * (S_d + S_d.conj().T)
N_d = 0.5 * (N_d + N_d.conj().T)
w = np.sort(sla.eigh(S_d, N_d, eigvals_only=True))
log(f"D dense top3 {w[-3:]}")

out.update(
    A_full_top3=[float(x) for x in evA[-3:]],
    B_window_top3=[float(x) for x in evB[-3:]],
    D_dense_top3=[float(x) for x in w[-3:]],
    A_retained=int((evA > 0.1).sum()),
    B_retained=int((evB > 0.1).sum()),
    D_retained=int((w > 0.1).sum()),
)
with open("/root/repo/doc/ns_window_ab.json", "w") as f:
    json.dump(out, f, indent=1)
log("written doc/ns_window_ab.json")
