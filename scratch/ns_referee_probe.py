"""Adjudicate the ns1 KL spectrum: numerics or physics?

VERDICT (superseded by scratch/ns_window_ab2.py +
tests/test_window_referee.py): this probe's C/D referee is FLAWED — it
builds beams with the table-local index (mv=0) through the legacy
builder, which zeroes the negative-m block and collapses the pencil
(top evals ~6 orders low).  The corrected A/B shows windowed == full ==
dense complex128 to ~2e-6: the engine is right, and ns1's retain-zero
spectrum is the feed-sparse polarised array's physics.  Kept for the
forensic record only.

The 13 banked north-star windows retain ZERO modes (max eval 5.4e-13,
floor 1e-33) — either the 2-feed toy array genuinely has no
signal-dominated modes, or the f32 factored pencil collapses at the
256-freq / full-octave conditioning that no referee test covers (the
dense referee pins bench scale: nfreq=8, 50 MHz span).

This probe isolates the suspicious axis: ns1's frequency geometry
(400-800 MHz octave, feeds=1 per cylinder) at CPU-affordable lmax
(cylinder_width=3 -> lmax ~ 110), sweeping nfreq.  For each nfreq it
runs the ENGINE exactly as ns1 does (windowed btm_resident +
product_all_resident(bucket=True)) on one mid-m window and solves the
same pencil densely in complex128 (the reference algorithm,
/root/reference/drift/core/kltransform.py:258-341).  If the engine
collapses while the dense referee keeps O(>=0.1) evals, it is a
correctness bug at scale; if both collapse equally, ns1's spectrum is
real physics of the feed-sparse array.

CPU-pinned; run niced (the chip chain owns the un-niced share).
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
    print(f"[probe +{time.time()-T0:6.1f}s] {msg}", flush=True)


def run_case(nfreq, m_probe=40):
    tel = cylinder.UnpolarisedCylinderTelescope.from_config(dict(
        num_freq=nfreq, freq_start=400.0, freq_end=800.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=3.0, num_feeds=1,
        feed_spacing=6.0, tsys=50.0, single_precision=True,
    ))
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]

    m0, m1 = m_probe, m_probe + 1
    pos, neg = resident.btm_resident(tel, blg, fig, m_range=(m0, m1))
    ev, nmo = resident.product_all_resident(
        tel, pos, neg, ls, lf, noisew, bucket=True, m_range=(m0, m1),
        kl_cut=0.1,
    )
    ev_engine = np.sort(np.asarray(ev)[0])
    # pinned full depth through the same windowed path: adaptive sig1
    # is allowed to be absolutely-wrong below the retention cut, so the
    # referee comparison must pin the depth
    ev2, _ = resident.product_all_resident(
        tel, pos, neg, ls, lf, noisew, bucket=True, m_range=(m0, m1),
        kl_cut=0.1, sig_levels=2,
    )
    ev_deep = np.sort(np.asarray(ev2)[0])

    # dense complex128 referee on the same pencil: project the raw C_l
    # tables through the engine's own noise-weighted beam
    nl = tel.lmax + 1
    npol = tel.num_pol_sky
    F = tel.nfreq
    assert npol == 1
    mv = jnp.asarray(np.array([m_probe - m0], np.int32))
    beams_re, beams_im = resident._build_beam_batch(
        pos.re, pos.im, neg.re, neg.im, mv, tel.npairs, F, npol, nl
    )
    res = mstep.kl_product_step_split(
        beams_re, beams_im,
        jnp.asarray(np.asarray(noisew), beams_re.dtype),
        ls, lf, jnp.asarray(np.array([m_probe], np.int32)),
        npol=npol, nl=nl,
    )
    ev_step = np.sort(np.asarray(res.evals)[0])
    bs = (np.asarray(res.beam_re) + 1j * np.asarray(res.beam_im))[0]
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

    out = dict(
        nfreq=nfreq,
        lmax=tel.lmax,
        npairs=tel.npairs,
        n=n,
        m=m_probe,
        engine_max=float(ev_engine[-1]),
        engine_deep_max=float(ev_deep[-1]),
        engine_deep_top5=[float(x) for x in ev_deep[-5:]],
        engine_top5=[float(x) for x in ev_engine[-5:]],
        step_max=float(ev_step[-1]),
        dense_max=float(w[-1]),
        dense_top5=[float(x) for x in w[-5:]],
        ratio=float(ev_engine[-1] / w[-1]) if w[-1] > 0 else None,
        retained_engine=int((ev_engine > 0.1).sum()),
        retained_dense=int((w > 0.1).sum()),
    )
    log(json.dumps(out))
    return out


if __name__ == "__main__":
    cases = [int(x) for x in os.environ.get("NSPROBE_NF", "8,32,96").split(",")]
    results = [run_case(nf) for nf in cases]
    with open("/root/repo/doc/ns_referee_probe.json", "w") as f:
        json.dump({"cases": results}, f, indent=1)
    log("written doc/ns_referee_probe.json")
