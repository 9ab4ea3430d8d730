#!/usr/bin/env python
"""Stage-level on-chip profile of the exact KL pencil at bench scale.

The round-1 bench ran the product phase at 6.5 s (one QDWH eigh per m);
the round-2 exact engine — which FIXED the spectrum (r01's path returns
max_ev 0.016 where the validated pencil returns 0.84 on the same
inputs) — runs the same phase at ~58 s.  This profiles where those
~250 ms/m go, stage by stage (synthetic inputs of the true shapes; every
stage is fixed-iteration so timing is shape-driven), and A/Bs the two
cheap recovery levers:

* global matmul precision `default` vs the library's pinned `highest`
  for the whole spectrum batch (accuracy-gated on retained evals);
* `bucket=True` for the full product phase (per-m dof compaction).

Writes doc/exact_profile.json.
"""

import functools
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
from driftscan_tpu.ops import fpencil
from driftscan_tpu.ops import zarray as za
from driftscan_tpu.parallel import mstep, resident


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(np.asarray(leaves[0]).ravel()[0])


def t(f, *a, n=3):
    out = f(*a)
    sync(out)
    best = np.inf
    for _ in range(n):
        st = time.time()
        out = f(*a)
        sync(out)
        best = min(best, time.time() - st)
    return best


def _flush(rec):
    """Incremental evidence dump: a tunnel wedge mid-profile must never
    lose the levers already measured (round-4 lost ~70% of a session's
    measurements to an end-only record write; round 5 lost the phase
    probes the same way and had to transcribe the rest from the log)."""
    path = ("/tmp/exact_profile_cpu.partial.json" if os.environ.get("AB_CPU")
            else "/root/repo/doc/exact_profile_partial.json")
    with open(path + ".tmp", "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(path + ".tmp", path)


def main():
    rec = {"stages_ms": {}}
    tel = bench.build_telescope()
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    bl, fi = np.arange(tel.npairs), np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig)
    sync(pos.re.sum())
    print(f"btm {time.time()-st:.0f}s", flush=True)

    nl = tel.lmax + 1
    F, S = tel.nfreq, min(nl, 2 * tel.npairs)
    npol = tel.num_pol_sky
    n = F * S * npol
    Ks, Kf = nl * ls.shape[-1], nl * lf.shape[-1]
    mb = 8
    rec.update(n=n, Ks=Ks, Kf=Kf, mb=mb, nm=tel.mmax + 1)
    print(f"n={n} Ks={Ks} Kf={Kf}", flush=True)

    dt = pos.re.dtype
    nw = jnp.asarray(noisew, dtype=dt)
    lsj = jnp.asarray(ls, dtype=dt)
    lfj = jnp.asarray(lf, dtype=dt)
    mv = jnp.asarray(np.arange(8, 8 + mb, dtype=np.int32))
    base = functools.partial(
        resident._spectrum_batch,
        npairs=tel.npairs, nfreq=tel.nfreq, nl=nl, npol=npol,
    )

    dt_ref = t(lambda: base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
                            sig_levels=2))
    rec["batch_ms_sig2"] = round(dt_ref * 1e3, 1)
    ev_ref = np.asarray(
        base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
             sig_levels=2)[0]
    )
    print(f"batch mb={mb} exact(sig_levels=2): {dt_ref*1e3:.0f} ms", flush=True)

    # ---- synthetic per-stage probes (shapes of the real batch) ----
    rng = np.random.default_rng(0)

    def zrand(*shape):
        return za.Z(
            jnp.asarray(rng.standard_normal(shape), dt),
            jnp.asarray(rng.standard_normal(shape), dt),
        )

    bsyn = zrand(mb, F, S, npol, nl)
    a_s = zrand(mb, n, Ks)
    a_f = zrand(mb, n, Kf) * jnp.asarray(1e-3, dt)
    y = zrand(mb, n, Ks)

    def probe(name, fn, *args):
        f = jax.jit(fn)
        ms = t(lambda: f(*args)) * 1e3
        rec["stages_ms"][name] = round(ms, 1)
        print(f"stage {name}: {ms:.0f} ms", flush=True)
        _flush(rec)

    probe(
        "beam_factor_sig",
        jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lsj)),
        bsyn.re, bsyn.im,
    )
    probe(
        "beam_factor_fg",
        jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lfj)),
        bsyn.re, bsyn.im,
    )

    probe(
        "beam_factor_compact_sig",
        jax.vmap(
            lambda br, bi: fpencil.beam_factor_compact(za.Z(br, bi), lsj)
        ),
        bsyn.re, bsyn.im,
    )

    # broadcast lowering of the same stage (diagonal f/l einsum avoided)
    bf_fn = jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lsj))
    a_einsum = bf_fn(bsyn.re, bsyn.im)
    prev_bf = fpencil._BEAM_FACTOR_IMPL
    fpencil._BEAM_FACTOR_IMPL = "bcast"
    try:
        probe(
            "beam_factor_sig_bcast",
            jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lsj)),
            bsyn.re, bsyn.im,
        )
        probe(
            "beam_factor_fg_bcast",
            jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lfj)),
            bsyn.re, bsyn.im,
        )
        a_bcast = jax.vmap(
            lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lsj)
        )(bsyn.re, bsyn.im)
    finally:
        fpencil._BEAM_FACTOR_IMPL = prev_bf
    denom = float(np.abs(np.asarray(a_einsum.re)).max()) + 1e-30
    rec["beam_factor_bcast_rel"] = float(
        max(
            np.abs(np.asarray(a_bcast.re) - np.asarray(a_einsum.re)).max(),
            np.abs(np.asarray(a_bcast.im) - np.asarray(a_einsum.im)).max(),
        )
        / denom
    )
    print(
        f"beam_factor bcast elementwise rel {rec['beam_factor_bcast_rel']:.2e}",
        flush=True,
    )

    from driftscan_tpu.ops import linalg as dlinalg

    bw = zrand(mb, F, 2 * tel.npairs, npol * nl)
    probe(
        "triple_svd",
        jax.vmap(
            lambda br, bi: dlinalg.triple_svd_split_batched(
                br, bi, npol=npol, nl=nl, polsvcut=1e-4
            )[4]
        ),
        bw.re, bw.im,
    )

    def noise_qr(fr, fi_, rounds=None):
        rows = fpencil._thermal_noise_rows(za.Z(fr, fi_), 1.0)
        aug = za.interleave(rows)
        return fpencil.chol_qr_r(aug, rounds=rounds)

    probe("noise_qr", jax.vmap(noise_qr), a_f.re, a_f.im)
    probe(
        "noise_qr_r4",
        jax.vmap(lambda fr, fi_: noise_qr(fr, fi_, rounds=4)),
        a_f.re, a_f.im,
    )
    probe(
        "noise_qr_split",
        jax.vmap(
            lambda fr, fi_: fpencil._chol_qr_r_split(
                fpencil._thermal_noise_rows(za.Z(fr, fi_), 1.0)
            )
        ),
        a_f.re, a_f.im,
    )

    r_e = jax.vmap(noise_qr)(a_f.re, a_f.im)
    probe(
        "tri_solve_y",
        jax.vmap(
            lambda r, sre, sim: fpencil._solve_tri_interleaved(
                r, za.Z(sre, sim), adjoint=True
            )
        ),
        r_e, a_s.re, a_s.im,
    )

    for lv in (1, 2):
        probe(
            f"gram_bands_l{lv}",
            jax.vmap(
                lambda yre, yim, lv=lv: fpencil.gram_bands(
                    za.Z(yre, yim), levels=lv
                ).s
            ),
            y.re, y.im,
        )

    # r01-equivalent single dense eigh of the (n, n) Gram
    g = zrand(mb, n, n)
    probe(
        "dense_eigh_n",
        jax.vmap(lambda gre, gim: za.eigh(za.Z(gre, gim))[0]),
        g.re, g.im,
    )

    # ---- the same stage table at the PINNED production batch (mb=64):
    # the mb=8 table mis-ranks stages whose cost is per-dispatch rather
    # than per-row (the round-3 whiten A/B tie showed the tall triangular
    # solve amortises with batch depth), so the optimisation target must
    # be ranked at the batch size the bench actually runs.
    mb64 = 64
    rec["stages64_ms"] = {}
    bsyn64 = zrand(mb64, F, S, npol, nl)
    a_s64 = zrand(mb64, n, Ks)
    a_f64 = zrand(mb64, n, Kf) * jnp.asarray(1e-3, dt)
    y64 = zrand(mb64, n, Ks)
    g64 = zrand(mb64, n, n)

    def probe64(name, fn, *args):
        f = jax.jit(fn)
        ms = t(lambda: f(*args)) * 1e3
        rec["stages64_ms"][name] = round(ms, 1)
        print(f"stage64 {name}: {ms:.0f} ms ({ms/mb64:.1f} ms/m)", flush=True)
        _flush(rec)

    probe64(
        "beam_factor_sig",
        jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lsj)),
        bsyn64.re, bsyn64.im,
    )
    probe64(
        "beam_factor_fg",
        jax.vmap(lambda br, bi: fpencil.beam_factor(za.Z(br, bi), lfj)),
        bsyn64.re, bsyn64.im,
    )
    bw64 = zrand(mb64, F, 2 * tel.npairs, npol * nl)
    probe64(
        "triple_svd",
        jax.vmap(
            lambda br, bi: dlinalg.triple_svd_split_batched(
                br, bi, npol=npol, nl=nl, polsvcut=1e-4
            )[4]
        ),
        bw64.re, bw64.im,
    )
    probe64(
        "noise_qr_split",
        jax.vmap(
            lambda fr, fi_: fpencil._chol_qr_r_split(
                fpencil._thermal_noise_rows(za.Z(fr, fi_), 1.0)
            )
        ),
        a_f64.re, a_f64.im,
    )
    r_e64 = jax.vmap(noise_qr)(a_f64.re, a_f64.im)
    probe64(
        "tri_solve_y",
        jax.vmap(
            lambda r, sre, sim: fpencil._solve_tri_interleaved(
                r, za.Z(sre, sim), adjoint=True
            )
        ),
        r_e64, a_s64.re, a_s64.im,
    )
    for lv in (1, 2):
        probe64(
            f"gram_bands_l{lv}",
            jax.vmap(
                lambda yre, yim, lv=lv: fpencil.gram_bands(
                    za.Z(yre, yim), levels=lv
                ).s
            ),
            y64.re, y64.im,
        )
    probe64(
        "dense_eigh_n",
        jax.vmap(lambda gre, gim: za.eigh(za.Z(gre, gim))[0]),
        g64.re, g64.im,
    )
    # eigenvector half: whiten-back of the selected basis (R^-1 U)
    probe64(
        "tri_solve_back_u",
        jax.vmap(
            lambda r, ure, uim: fpencil._solve_tri_interleaved(
                r, za.Z(ure, uim), adjoint=False
            )
        ),
        r_e64, g64.re, g64.im,
    )

    # ---- lever 1: global matmul precision (accuracy-gated) ----
    resident._spectrum_batch.clear_cache()
    with jax.default_matmul_precision("default"):
        dt_d = t(lambda: base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj,
                              mv, sig_levels=2))
        ev_d = np.asarray(
            base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
                 sig_levels=2)[0]
        )
    resident._spectrum_batch.clear_cache()
    keep = ev_ref > 0.1
    sets_equal = bool(((ev_d > 0.1) == keep).all())
    rel = (
        float((np.abs(ev_d[keep] - ev_ref[keep]) / ev_ref[keep]).max())
        if keep.any()
        else 0.0
    )
    rec["batch_ms_default_prec"] = round(dt_d * 1e3, 1)
    rec["default_prec_rel"] = rel
    rec["default_prec_sets_equal"] = sets_equal
    print(f"batch default-precision: {dt_d*1e3:.0f} ms rel={rel:.2e} "
          f"sets_equal={sets_equal}", flush=True)
    _flush(rec)

    # ---- lever 3: big m-batch at pinned depth ----
    # the mbatch sweep's rel ~5e-3 across batch sizes is the adaptive
    # sig_levels boundary moving with batch composition; pinning the
    # depth should make results batch-size-independent
    mb2 = min(64, tel.mmax + 1 - 8)
    mv64 = jnp.asarray(np.arange(8, 8 + mb2, dtype=np.int32))
    dt64 = t(lambda: base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv64,
                          sig_levels=2))
    ev64 = np.asarray(
        base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv64,
             sig_levels=2)[0]
    )
    # clamp the comparison window: at small (flow-check) scales the
    # deep batch can hold fewer m's than the mb=8 reference
    nc = min(mb, ev64.shape[0])
    keep_c = keep[:nc]
    rel64 = (
        float((np.abs(ev64[:nc][keep_c] - ev_ref[:nc][keep_c])
               / ev_ref[:nc][keep_c]).max())
        if keep_c.any()
        else 0.0
    )
    rec["batch64_ms_sig2"] = round(dt64 * 1e3, 1)
    rec["batch64_per_m_ms"] = round(dt64 * 1e3 / mb2, 1)
    rec["batch64_rel_vs_mb8"] = rel64
    rec["batch64_sets_equal"] = bool(
        ((ev64[:nc] > 0.1) == (ev_ref[:nc] > 0.1)).all()
    )
    print(f"batch mb={mb2} sig2: {dt64*1e3:.0f} ms "
          f"({dt64*1e3/mb2:.0f} ms/m) rel_vs_mb8={rel64:.2e}", flush=True)

    def lever_batch(tag, mvx, mbx, qr_rounds=None, **kw):
        """Time base() at (mvx, kw) and gate accuracy vs the mb=8 sig2
        reference window (first `mb` rows align: every mv starts at 8).
        ``qr_rounds`` patches the CholQR round count for this probe
        (module-global, so the jit cache must be cleared around it)."""
        if qr_rounds is not None:
            fpencil._CHOLQR_ROUNDS = qr_rounds
            resident._spectrum_batch.clear_cache()
        try:
            dtx = t(lambda: base(pos.re, pos.im, neg.re, neg.im, nw, lsj,
                                 lfj, mvx, **kw))
            evx = np.asarray(
                base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mvx,
                     **kw)[0]
            )
        finally:
            if qr_rounds is not None:
                fpencil._CHOLQR_ROUNDS = None
                resident._spectrum_batch.clear_cache()
        ncx = min(mb, evx.shape[0])
        keep_x = keep[:ncx]
        relx = (
            float((np.abs(evx[:ncx][keep_x] - ev_ref[:ncx][keep_x])
                   / ev_ref[:ncx][keep_x]).max())
            if keep_x.any()
            else 0.0
        )
        rec[f"{tag}_ms"] = round(dtx * 1e3, 1)
        rec[f"{tag}_per_m_ms"] = round(dtx * 1e3 / mbx, 1)
        rec[f"{tag}_rel"] = relx
        rec[f"{tag}_sets_equal"] = bool(
            ((evx[:ncx] > 0.1) == (ev_ref[:ncx] > 0.1)).all()
        )
        print(f"{tag}: {dtx*1e3:.0f} ms ({dtx*1e3/mbx:.1f} ms/m) "
              f"rel={relx:.2e} sets_equal={rec[f'{tag}_sets_equal']}",
              flush=True)
        _flush(rec)

    # ---- lever 4: one whitened-signal Gram level at the pinned batch
    # (the QR path's y spectrum is narrow; the retained band spans only
    # ~1.6 eigenvalue decades at bench conditioning, well inside one
    # level's 1/band_rel^2 reach — if the gate passes this halves the
    # Gram/eigh stage) ----
    lever_batch("batch64_sig1", mv64, mb2, sig_levels=1)

    # ---- lever 5: deeper pinned batch (the 64 -> 137 ms/m curve was
    # still amortising per-dispatch cost; n=352 buffers leave HBM room
    # for 128-deep batches) ----
    mb3 = min(128, tel.mmax + 1 - 8)
    mv128 = jnp.asarray(np.arange(8, 8 + mb3, dtype=np.int32))
    lever_batch("batch128_sig2", mv128, mb3, sig_levels=2)
    lever_batch("batch128_sig1", mv128, mb3, sig_levels=1)
    rec["mb128"] = mb3

    # ---- lever 6: CholQR round count.  The f32 default (8) covers
    # cond(N) ~ 1e18; at bench-class conditioning rounds=4 sits on the
    # same f32 Gram noise floor (CPU referee: 9.7e-4 vs 1.3e-3 top-mode
    # rel at cond 3.4e11, rounds=3 degrades to 8.5e-3), and each round
    # is a full tall Gram + update — the noise QR is ~2/3 of the
    # pencil-construction flops ----
    lever_batch("batch64_qr4", mv64, mb2, qr_rounds=4, sig_levels=2)
    lever_batch("batch128_sig1_qr4", mv128, mb3, qr_rounds=4, sig_levels=1)

    # ---- lever 8: half-spectrum batch.  Every stage runs at <1% MXU
    # utilisation at n=352 (latency/bandwidth-bound, not flop-bound):
    # per-dispatch cost keeps amortising with depth.  113 divides the
    # 226-m bench spectrum exactly (two full batches, zero padding
    # waste — mb=128 would pad 58% of its second batch).  Fail-soft:
    # an OOM records the failure instead of killing the profile. ----
    mb4 = min(113, tel.mmax + 1 - 8)
    mv113 = jnp.asarray(np.arange(8, 8 + mb4, dtype=np.int32))
    try:
        lever_batch("batch113_sig1_qr4", mv113, mb4, qr_rounds=4,
                    sig_levels=1)
        rec["mb113"] = mb4
    except Exception as exc:
        rec["batch113_err"] = repr(exc)[:200]
        print(f"batch113 probe failed (likely HBM): {exc!r}", flush=True)

    # ---- lever 9: matmul precision "high" (bf16x3, eps ~ 5e-7) for the
    # whole batch — half the MXU passes of the pinned "highest"
    # (bf16x6).  "default" (1-pass bf16) already failed its gate; the
    # 3-pass tier was never measured. ----
    resident._spectrum_batch.clear_cache()
    try:
        with jax.default_matmul_precision("high"):
            dt_h = t(lambda: base(pos.re, pos.im, neg.re, neg.im, nw, lsj,
                                  lfj, mv, sig_levels=2))
            ev_h = np.asarray(
                base(pos.re, pos.im, neg.re, neg.im, nw, lsj, lfj, mv,
                     sig_levels=2)[0]
            )
        rel_h = (
            float((np.abs(ev_h[keep] - ev_ref[keep]) / ev_ref[keep]).max())
            if keep.any()
            else 0.0
        )
        rec["batch_ms_high_prec"] = round(dt_h * 1e3, 1)
        rec["high_prec_rel"] = rel_h
        rec["high_prec_sets_equal"] = bool(((ev_h > 0.1) == keep).all())
        print(f"batch high-precision: {dt_h*1e3:.0f} ms rel={rel_h:.2e} "
              f"sets_equal={rec['high_prec_sets_equal']}", flush=True)
    except Exception as exc:
        rec["high_prec_err"] = repr(exc)[:200]
        print(f"high-precision probe failed: {exc!r}", flush=True)
    finally:
        resident._spectrum_batch.clear_cache()

    # ---- lever 7: the engine's own adaptive depth (sig1 first, re-solve
    # offender batches at sig2 — guards the low-m wide-retained-range
    # batches the pinned probes above never see).  The host-side
    # re-solve logic lives in product_all_resident, so time the full
    # phase, not a single batch. ----
    def phase_probe(tag, qr_rounds=None, **kw):
        if qr_rounds is not None:
            fpencil._CHOLQR_ROUNDS = qr_rounds
            resident._spectrum_batch.clear_cache()
        try:
            resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, max_m=mb, **kw
            )  # warm
            st = time.time()
            ev, _ = resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, **kw
            )
            dtp = time.time() - st
        finally:
            if qr_rounds is not None:
                fpencil._CHOLQR_ROUNDS = None
                resident._spectrum_batch.clear_cache()
        rec[f"{tag}_s"] = round(dtp, 2)
        rec[f"{tag}_per_m_ms"] = round(dtp * 1e3 / (tel.mmax + 1), 1)
        _flush(rec)
        return ev

    ev_pha = phase_probe("phase_adaptive64", mbatch=64, bucket=False)
    ev_phaq = phase_probe(
        "phase_adaptive64_qr4", qr_rounds=4, mbatch=64, bucket=False
    )

    # ---- fused-Fisher gate for the aggressive combo: the spectrum gate
    # above cannot see eigenvector quality, and the 4-phase headline
    # contracts retained eigenvectors against the band covariances.
    # Compare the fused Fisher over the first 16 m under (sig1, qr4)
    # against the reference settings; BASELINE's Fisher accuracy tier is
    # 3e-2, gate at 1e-2. ----
    try:
        band_lt = mstep.band_factor_table(
            iter(bench._fisher_bands(tel)), out_dtype=np.float32,
            rank_rtol=1e-9,
        )
        fkw = dict(band_lt=band_lt, ps_threshold=0.1, max_m=16)
        # the reference MUST pin sig_levels=2 (the validated headline
        # depth): the adaptive default resolves to sig1 at bench
        # conditioning (lam_max < the escalation bound), which would
        # compare the candidate to itself.  And _CHOLQR_ROUNDS is
        # trace-time state read by _fisher_batch — whose cache must be
        # cleared on BOTH sides of the patch or the second dispatch
        # reuses the first leg's compiled rounds (the round-5 vacuous
        # gate: rel exactly 0.0).
        _, _, fish_ref = resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, sig_levels=2, **fkw
        )
        if float(np.abs(fish_ref).max()) == 0.0:
            raise RuntimeError(
                "vacuous gate: reference Fisher is identically zero "
                "(no retained modes in the gate window)"
            )
        fpencil._CHOLQR_ROUNDS = 4
        resident._spectrum_batch.clear_cache()
        resident._fisher_batch.clear_cache()
        try:
            _, _, fish_agg = resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, sig_levels=1, **fkw
            )
        finally:
            fpencil._CHOLQR_ROUNDS = None
            resident._spectrum_batch.clear_cache()
            resident._fisher_batch.clear_cache()
        denom = float(np.abs(fish_ref).max()) + 1e-30
        rec["fisher_combo_rel"] = float(
            np.abs(fish_agg - fish_ref).max() / denom
        )
        rec["fisher_combo_ok"] = bool(
            np.isfinite(fish_agg).all() and rec["fisher_combo_rel"] <= 1e-2
        )
        print(f"fisher combo gate: rel={rec['fisher_combo_rel']:.2e} "
              f"ok={rec['fisher_combo_ok']}", flush=True)
    except Exception as exc:  # fisher-off beats losing the profile
        rec["fisher_combo_ok"] = False
        rec["fisher_combo_err"] = repr(exc)[:200]
        print(f"fisher combo gate unavailable: {exc!r}", flush=True)

    # ---- lever 2: bucketed full phase ----
    nm = tel.mmax + 1
    for bucket in (False, True):
        resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, max_m=mb, bucket=bucket
        )
        st = time.time()
        ev, _ = resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, bucket=bucket
        )
        dtb = time.time() - st
        key = "phase_s_bucket" if bucket else "phase_s_flat"
        rec[key] = round(dtb, 2)
        if bucket:
            kb = ev_full_flat > 0.1
            rec["bucket_sets_equal"] = bool(((ev > 0.1) == kb).all())
            rec["bucket_rel"] = (
                float((np.abs(ev[kb] - ev_full_flat[kb])
                       / ev_full_flat[kb]).max())
                if kb.any()
                else 0.0
            )
        else:
            ev_full_flat = ev
        print(f"full phase bucket={bucket}: {dtb:.1f} s", flush=True)

    # adaptive-depth full-phase accuracy vs the auto-depth flat phase
    # (both adaptive policies; differs only in batch depth / qr rounds)
    kflat = ev_full_flat > 0.1
    for tag, evx in (("phase_adaptive64", ev_pha),
                     ("phase_adaptive64_qr4", ev_phaq)):
        rec[f"{tag}_sets_equal"] = bool(((evx > 0.1) == kflat).all())
        rec[f"{tag}_rel"] = (
            float((np.abs(evx[kflat] - ev_full_flat[kflat])
                   / ev_full_flat[kflat]).max())
            if kflat.any()
            else 0.0
        )
        print(f"{tag}: rel={rec[f'{tag}_rel']:.2e} "
              f"sets_equal={rec[f'{tag}_sets_equal']}", flush=True)

    rec.update(_picks(rec))
    print(
        f"picks: exact_prec={rec['exact_prec_pick']} "
        f"mbatch_pinned={rec['mbatch_pinned_pick']}",
        flush=True,
    )

    # the adopted decision record is chip-measured only: a CPU flow
    # check must never clobber it
    out_path = (
        "/tmp/exact_profile_cpu.json"
        if os.environ.get("AB_CPU")
        else "/root/repo/doc/exact_profile.json"
    )
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"record written to {out_path}", flush=True)


# Accuracy gate for the picks: retained-set equality plus eigenvalue
# agreement within 1e-3 relative.  1e-3 is the engine's own validated
# noise envelope — the dense complex128 referee agreement is ~2e-4 on
# the top modes (tests/test_dense_referee.py) and one whitened-signal
# Gram level resolves retained eigenvalues to ~1e-3 relative (the
# adaptive-depth escalation bound) — so demanding tighter batch-to-batch
# reproducibility than the engine's accuracy claim would reject
# legitimate configurations (measured: mb=64 pinned-depth differs from
# mb=8 by 4.6e-4 from XLA fusion/tiling rounding, while the adaptive
# mbatch sweep at 5e-3 noise kept retained sets exactly equal across
# 8/16/32/64 — doc/mbatch_ab.json).
_GATE_REL = 1e-3


def _picks(rec):
    """Accuracy-gated bench picks from a profile record (pure function of
    the recorded numbers; `--regate` reapplies it to an existing record)."""
    out = {}
    out["exact_prec_pick"] = (
        "default"
        if (
            rec["default_prec_sets_equal"]
            and rec["default_prec_rel"] <= _GATE_REL
            and rec["batch_ms_default_prec"] < 0.95 * rec["batch_ms_sig2"]
        )
        else None
    )
    if out["exact_prec_pick"] is None and (
        rec.get("high_prec_sets_equal", False)
        and rec.get("high_prec_rel", 1.0) <= _GATE_REL
        and rec.get("batch_ms_high_prec", 9e9)
        < 0.95 * rec["batch_ms_sig2"]
    ):
        out["exact_prec_pick"] = "high"
    mb = rec["mb"]
    per_m_ref = rec["batch_ms_sig2"] / mb
    # pinned-depth candidates, gated individually; fastest gated per-m wins
    cands = []
    if "batch64_per_m_ms" in rec and (
        rec.get("batch64_sets_equal", True)
        and rec["batch64_rel_vs_mb8"] <= _GATE_REL
        and rec["batch64_per_m_ms"] < 0.95 * per_m_ref
    ):
        cands.append(
            (rec["batch64_per_m_ms"],
             round(rec["batch64_ms_sig2"] / rec["batch64_per_m_ms"]))
        )
    if "batch128_sig2_per_m_ms" in rec and (
        rec.get("batch128_sig2_sets_equal", True)
        and rec["batch128_sig2_rel"] <= _GATE_REL
        and rec["batch128_sig2_per_m_ms"] < 0.95 * per_m_ref
    ):
        cands.append(
            (rec["batch128_sig2_per_m_ms"],
             round(rec["batch128_sig2_ms"] / rec["batch128_sig2_per_m_ms"]))
        )
    out["mbatch_pinned_pick"] = int(min(cands)[1]) if cands else None
    # combined (mbatch, sig_levels) pick: ONLY measured combinations
    # compete (a cross of two individually-gated picks is an unmeasured
    # configuration), each gated on the same mb=8 sig2 reference
    combos = []
    nm_rec0 = rec.get("nm", 0)

    def _eff(per_m, mbx):
        # phase-effective per-m: the real nm-long phase pads its last
        # batch to mbx (mb=128 over nm=226 wastes 13% of its slots)
        if not nm_rec0:
            return per_m
        return per_m * (-(-nm_rec0 // mbx) * mbx) / nm_rec0

    if "batch64_per_m_ms" in rec and (
        rec.get("batch64_sets_equal", True)
        and rec["batch64_rel_vs_mb8"] <= _GATE_REL
        and rec["batch64_per_m_ms"] < 0.95 * per_m_ref
    ):
        combos.append((_eff(rec["batch64_per_m_ms"], 64), 64, 2, 0))
    mb128 = rec.get("mb128", 128)
    mb113 = rec.get("mb113", 113)
    nm_rec = rec.get("nm", 0)
    for tag, mbx, sl, qr in (
        ("batch128_sig2", mb128, 2, 0),
        ("batch64_sig1", 64, 1, 0),
        ("batch128_sig1", mb128, 1, 0),
        ("batch64_qr4", 64, 2, 4),
        ("batch128_sig1_qr4", mb128, 1, 4),
        ("batch113_sig1", mb113, 1, 0),
        ("batch113_sig1_qr4", mb113, 1, 4),
        # sig_levels 0 = the engine's adaptive depth (bench maps to None);
        # measured as a full phase, so its per-m includes host dispatch
        ("phase_adaptive64", 64, 0, 0),
        ("phase_adaptive64_qr4", 64, 0, 4),
    ):
        if f"{tag}_per_m_ms" in rec and (
            rec.get(f"{tag}_sets_equal", False)
            and rec[f"{tag}_rel"] <= _GATE_REL
            and rec[f"{tag}_per_m_ms"] < 0.95 * per_m_ref
            # non-default sig/qr combos additionally need the fused-
            # Fisher gate (eigenvector quality, invisible to the
            # spectrum gate); the adaptive depth (sl=0) is the library
            # default policy, so only qr4 triggers the gate there
            and ((sl in (0, 2) and qr == 0)
                 or rec.get("fisher_combo_ok", False))
        ):
            # single-batch probes compare at the PHASE-effective per-m:
            # the real nm-long phase pads its last batch to mbx, so a
            # deep batch that mis-tiles nm (mb=128 over nm=226 wastes
            # 13% of its slots) must not beat one that tiles exactly.
            eff = rec[f"{tag}_per_m_ms"]
            if tag.startswith("batch"):
                eff = _eff(eff, mbx)
            combos.append((eff, mbx, sl, qr))
    if combos:
        best = min(combos)
        out["product_pick"] = {
            "mbatch": int(best[1]),
            "sig_levels": int(best[2]),
            # 0 = library default round count (conditioning worst-case)
            "cholqr_rounds": int(best[3]),
        }
    else:
        out["product_pick"] = None
    # beam_factor lowering: elementwise agreement (far stronger than the
    # spectrum gate — bit-identical at npol=1 where p has one term) plus
    # a real stage win on both sides
    st = rec.get("stages_ms", {})
    out["beam_factor_pick"] = (
        "bcast"
        if (
            rec.get("beam_factor_bcast_rel", 1.0) <= 1e-6
            and st.get("beam_factor_sig_bcast", 9e9)
            + st.get("beam_factor_fg_bcast", 9e9)
            < 0.95 * (st.get("beam_factor_sig", 0) + st.get("beam_factor_fg", 0))
        )
        else None
    )
    return out


def regate():
    """Reapply the pick gate to the existing record (no device)."""
    path = "/root/repo/doc/exact_profile.json"
    with open(path) as f:
        rec = json.load(f)
    rec.update(_picks(rec))
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(
        f"regated: exact_prec={rec['exact_prec_pick']} "
        f"mbatch_pinned={rec['mbatch_pinned_pick']}",
        flush=True,
    )


if __name__ == "__main__":
    if "--regate" in sys.argv:
        regate()
    else:
        main()
