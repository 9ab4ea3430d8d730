#!/usr/bin/env python
"""Benchmark: m-modes/sec/chip for BTM + SVD + KL product generation.

Runs the two hot phases of the pipeline on the default accelerator:

1. BTM generation — batched beam maps + spherical harmonic transform for
   every (freq, baseline) unit of a mid-scale unpolarised cylinder;
2. the batched per-m product step — SVD compression + KL eigenproblem
   for every m-mode (driftscan_tpu.parallel.mstep).

On complex-free TPU runtimes both phases use the split-complex
implementations automatically.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the throughput ratio against the same program on the
host CPU backend (the reference runs on CPU clusters; BASELINE.md's
north-star is beating many-rank CPU runs), measured on a subset and
extrapolated.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache: the deep scan/eigh programs take minutes
# to compile cold; cached reruns start instantly.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np

SCALE = os.environ.get("BENCH_SCALE", "full")


def build_telescope():
    from driftscan_tpu.telescope import cylinder

    if SCALE == "small":
        params = dict(
            num_freq=4,
            freq_start=100.0,
            freq_end=110.0,
            freq_mode="edge",
            num_cylinders=2,
            cylinder_width=3.0,
            num_feeds=3,
            feed_spacing=1.0,
            tsys=50.0,
            single_precision=True,
        )
    else:
        # Mid-scale cylinder: mmax ~ 230, 8 freq channels, 67 baselines.
        params = dict(
            num_freq=8,
            freq_start=400.0,
            freq_end=450.0,
            freq_mode="edge",
            num_cylinders=2,
            cylinder_width=12.0,
            num_feeds=8,
            feed_spacing=0.6,
            tsys=50.0,
            single_precision=True,
        )
    return cylinder.UnpolarisedCylinderTelescope.from_config(params)


def build_pol_telescope():
    """Small polarised cylinder for the on-chip polarised leg.

    Exercises the npol=4 triple-SVD polarisation filtering
    (reference beamtransfer.py:730-929) end to end on the device at a
    scale that adds ~a minute to the bench, not tens of minutes.
    """
    from driftscan_tpu.telescope import cylinder

    return cylinder.PolarisedCylinderTelescope.from_config(
        dict(
            num_freq=4,
            freq_start=400.0,
            freq_end=450.0,
            freq_mode="edge",
            num_cylinders=2,
            cylinder_width=6.0,
            num_feeds=4,
            feed_spacing=1.5,
            tsys=50.0,
            single_precision=True,
        )
    )


def btm_phase(tel, max_units=None):
    """Compute BTMs for all (or max_units) fb units; returns (tarray, s, n)."""
    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    if max_units is not None:
        blg, fig = blg[:max_units], fig[:max_units]

    # Warm up compilation on one unit
    _log("BTM warm-up compile...")
    wt = time.time()
    tel.transfer_matrices(blg[:1], fig[:1])
    _PHASES.setdefault("t_btm_warmup_s", round(time.time() - wt, 2))
    _log("BTM warm-up done; full BTM phase...")

    st = time.time()
    tarray = tel.transfer_matrices(blg, fig)
    dt = time.time() - st
    return tarray, dt, len(blg)


# Phase/warm-up timings accumulated for the JSON detail block.
_PHASES = {}


def _covariances(tel):
    from driftscan_tpu.core import skymodel

    npol = tel.num_pol_sky
    cl_s = skymodel.im21cm_model(tel.lmax, tel.frequencies, npol)
    cl_n = skymodel.foreground_model(tel.lmax, tel.frequencies, npol)

    noisew = np.stack(
        [
            np.concatenate([w, w])
            for w in (
                tel.noisepower(np.arange(tel.npairs), fi).flatten() ** -0.5
                for fi in range(tel.nfreq)
            )
        ]
    )
    npower = np.stack(
        [
            np.concatenate([p, p])
            for p in (
                tel.noisepower(np.arange(tel.npairs), fi).flatten()
                for fi in range(tel.nfreq)
            )
        ]
    )
    # covariances stay f64: factor_cl's rank compaction measures the
    # numerical rank at f64 resolution (an early f32 cast raises the
    # noise floor above the cut and silently disables compaction); the
    # factors themselves are cast to f32 downstream.
    return cl_s, cl_n, noisew.astype(np.float32), npower.astype(np.float32)


def _beam_batch(tarray, ms, tel, mbatch):
    """(M, F, T, npol*nl) m-major c64 beam batch from the packed BTM array.

    tarray: (nunits, npol, nl, 2*nl-1) for unit-major (bl-major) ordering.
    """
    npairs, nfreq = tel.npairs, tel.nfreq
    npol = tel.num_pol_sky
    nl = tel.lmax + 1
    ntel = 2 * npairs

    t5 = tarray.reshape(npairs, nfreq, npol, nl, -1)
    M = len(ms)
    out = np.zeros((mbatch, nfreq, ntel, npol * nl), dtype=np.complex64)
    for i, mi in enumerate(ms):
        pos = t5[..., mi]  # (npairs, nfreq, npol, nl)
        neg = (
            (-1) ** mi * np.conj(t5[..., -mi]) if mi > 0 else np.zeros_like(pos)
        )
        blk = np.concatenate([pos, neg], axis=0)
        out[i] = blk.transpose(1, 0, 2, 3).reshape(nfreq, ntel, npol * nl)
    mv = np.full(mbatch, -1, np.int32)
    mv[:M] = ms
    return out, mv


def product_phase(tel, tarray, mbatch=None, max_m=None):
    """Run the batched SVD+KL product step over all m. Returns seconds."""
    import driftscan_tpu.backend as backend
    from driftscan_tpu.parallel import mstep

    nl = tel.lmax + 1
    nm = tel.mmax + 1 if max_m is None else max_m
    npol = tel.num_pol_sky

    if mbatch is None:
        # Bound the vmapped-eigh working set: ~10 live copies of the
        # (2*ndof)^2 embedding per batch element, within ~4 GB.
        ndof = tel.nfreq * min(nl, 2 * tel.npairs)
        per_m = (2 * ndof) ** 2 * 4 * 10
        mbatch = int(max(1, min(8, 4e9 // max(per_m, 1))))

    cl_s, cl_n, noisew, npower = _covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)

    split = backend.split_complex()
    if split:
        step = mstep.jit_product_step_split(npol=npol, nl=nl)
    else:
        step = mstep.jit_product_step(npol=npol, nl=nl)

    def run(beam, mv):
        if split:
            return step(
                np.ascontiguousarray(beam.real),
                np.ascontiguousarray(beam.imag),
                noisew,
                ls,
                lf,
                mv,
            )
        return step(beam, noisew, ls, lf, mv)

    # Warm-up compile
    _log(f"product warm-up compile (mbatch={mbatch})...")
    wt = time.time()
    beam0, mv0 = _beam_batch(tarray, np.arange(min(mbatch, nm)), tel, mbatch)
    res = run(beam0, mv0)
    res.evals.block_until_ready()
    _PHASES.setdefault("t_product_warmup_s", round(time.time() - wt, 2))
    _log("product warm-up done")

    st = time.time()
    for s in range(0, nm, mbatch):
        ms = np.arange(s, min(s + mbatch, nm))
        beam, mv = _beam_batch(tarray, ms, tel, mbatch)
        res = run(beam, mv)
        # Sync per batch: keeps the async queue (and device memory for
        # the large evecs outputs) bounded.
        res.evals.block_until_ready()
    return time.time() - st


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()

# Decision record written by the on-chip A/B (scratch/topband_ab.py at
# bench scale): which KL engine (and filter matmul precision) measured
# fastest *while passing the accuracy gates* (retained-mode sets equal,
# rel <= 1e-4 vs the exact engine, certificates clean).  Env vars always
# win so a human (or the driver) can pin either engine explicitly.
_AB_DECISION = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "doc", "topband_ab.json"
)
_SHT_AB_DECISION = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "doc", "sht_ab.json"
)
_MBATCH_AB_DECISION = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "doc", "mbatch_ab.json"
)
_EXACT_PROFILE_DECISION = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "doc", "exact_profile.json"
)
_WHITEN_AB_DECISION = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "doc", "whiten_ab.json"
)


def _read_pick(path, key):
    try:
        with open(path) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def _mbatch_default():
    """Headline product-phase (m-batch, sig_levels): BENCH_MBATCH env,
    else the stage profiler's pinned-depth pick (doc/exact_profile.json
    — batch-size-independent at sig_levels=2), else the adaptive-depth
    sweep's pick (doc/mbatch_ab.json), else (None, None) = auto.  Only
    the primary headline telescope uses this — the picks were measured
    at bench scale and do not transfer to the polarised/CPU legs."""
    env = os.environ.get("BENCH_MBATCH")
    if env:
        return int(env), None, None
    combo = _read_pick(_EXACT_PROFILE_DECISION, "product_pick")
    # fail-soft on a malformed record (missing/garbage keys fall through
    # to the pinned pick, mirroring _read_pick's OSError/ValueError path)
    if isinstance(combo, dict):
        try:
            return (
                int(combo["mbatch"]),
                # 0 = the engine's adaptive depth (product_all_resident's
                # sig_levels=None policy)
                int(combo["sig_levels"]) or None,
                int(combo.get("cholqr_rounds", 0)) or None,
            )
        except (KeyError, TypeError, ValueError):
            pass
    pinned = _read_pick(_EXACT_PROFILE_DECISION, "mbatch_pinned_pick")
    if pinned:
        return int(pinned), 2, None
    pick = _read_pick(_MBATCH_AB_DECISION, "mbatch_pick")
    return (int(pick) if pick else None), None, None


def _product_precision_default():
    """Matmul-precision tier for the product/fused phases only (the SHT
    keeps its own A/B'd pick): BENCH_EXACT_PRECISION env (empty string
    disables), else the stage profiler's accuracy-gated pick."""
    env = os.environ.get("BENCH_EXACT_PRECISION")
    if env is not None:
        return env or None
    return _read_pick(_EXACT_PROFILE_DECISION, "exact_prec_pick")


def _prec_ctx(p):
    import contextlib

    return jax.default_matmul_precision(p) if p else contextlib.nullcontext()


def resolve_sht_precision():
    """Adopt the SHT A/B record's accuracy-gated pick (env always wins).

    Shared by the bench and the north-star run so the adoption rule
    lives in one place.  Returns the effective precision (None =
    library "highest" default).
    """
    from driftscan_tpu.ops import sht

    if os.environ.get("DRIFTSCAN_TPU_SHT_PRECISION") is not None:
        return sht._SHT_PRECISION  # set from the env at sht import
    try:
        with open(_SHT_AB_DECISION) as f:
            sp = json.load(f).get("sht_precision_pick")
    except (OSError, ValueError):
        sp = None
    if sp:
        sht._SHT_PRECISION = sp
    return sht._SHT_PRECISION


def _engine_defaults():
    """Resolve {topband, filter/SHT precision} from env, else A/B records.

    The lever adoption itself (whiten / beam_factor / SHT precision /
    filter precision) is delegated to the package's canonical resolver,
    :mod:`driftscan_tpu.engine_picks` — the same one the product CLI
    runs — so the bench can never measure a configuration the CLI does
    not ship.  ``require_accelerator=False``: a CPU-pinned bench flow
    test exercises the exact picks the chip run will use.
    """
    out = {"topband": False, "source": "default"}
    try:
        with open(_AB_DECISION) as f:
            rec = json.load(f)
        out["topband"] = bool(rec.get("topband_wins", False))
        out["source"] = "ab_record"
    except (OSError, ValueError):
        pass
    from driftscan_tpu import engine_picks

    # derive the record dir from _AB_DECISION so tests that monkeypatch
    # the constant redirect every record read with it
    out.update(
        engine_picks.adopt_decision_records(
            directory=os.path.dirname(_AB_DECISION),
            require_accelerator=False,
        )
    )
    # resolve_sht_precision() also reports the env-pinned value the
    # resolver leaves alone (record only wins when the env is unset)
    sp = resolve_sht_precision()
    if sp:
        out["sht_precision"] = sp
    env = os.environ.get("BENCH_TOPBAND")
    if env is not None:
        out["topband"] = env == "1"
        out["source"] = "env"
    _PHASES.setdefault("engine", dict(out))
    return out


def resident_phases(
    tel,
    max_m=None,
    mbatch=None,
    max_units=None,
    sig_levels=None,
    product_precision=None,
):
    """Device-resident BTM + product phases; returns (t_btm, t_prod).

    Timings force execution with a scalar reduction fetch (the remote
    runtime's block_until_ready is not a reliable fence), so only O(1)
    bytes cross the link inside the timed regions.  ``max_units``
    restricts the BTM phase to a strided unit subset (for the
    extrapolated CPU baseline leg).  ``sig_levels`` pins the whitened-
    signal depth (None = adaptive); ``product_precision`` wraps ONLY the
    product phase in that matmul-precision tier (the BTM/SHT keeps its
    own A/B'd pick).
    """
    from driftscan_tpu.parallel import mstep, resident

    # resolve {engine, precisions} before anything compiles: the SHT
    # precision pick must be live for the BTM warm-up trace
    eng = _engine_defaults()

    if mbatch is None:
        mbatch = resident._auto_mbatch(tel)
    _PHASES.setdefault("mbatch", int(mbatch))

    cl_s, cl_n, noisew, _ = _covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)

    bl = np.arange(tel.npairs)
    fi = np.arange(tel.nfreq)
    blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]
    nfb_full = len(blg)
    if max_units is not None and max_units < len(blg):
        # stride so the subset samples every nside bucket
        stride = int(np.ceil(len(blg) / max_units))
        blg, fig = blg[::stride], fig[::stride]

    def sync(z):
        return float(np.asarray(z.re.sum() if hasattr(z, "re") else z.sum()))

    _log("BTM warm-up/compile pass...")
    wt = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig)
    sync(pos)
    _PHASES.setdefault("t_btm_warmup_s", round(time.time() - wt, 2))

    _log("BTM steady pass...")
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig)
    sync(pos)
    t_btm = time.time() - st

    if len(blg) < nfb_full:
        # unit-subset run (CPU baseline leg): tile the subset BTMs back to
        # the full unit count so the product phase does full-size work
        import jax.numpy as jnp

        idx = np.arange(nfb_full) % len(blg)
        pos = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), pos)
        neg = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), neg)

    nm = tel.mmax + 1 if max_m is None else max_m

    # Exact production configuration: QR foreground whitening + full
    # signal-side Gram levels (validated ~1e-5 of the dense f64 pencil).
    # The rank-capped quick-look (sig_k_cap=128, ~6e-3 bias, another
    # ~5x faster) is available but not what we headline.
    sig_k_cap = int(os.environ.get("BENCH_SIG_K_CAP", "0"))
    # Top-band KL engine (fpencil.gram_topband): exact retained spectrum
    # with a completeness certificate; sub-cut tail reported as zeros.
    topband = eng["topband"]

    _log(f"product warm-up compile (mbatch={mbatch}, sig_k_cap={sig_k_cap}, "
         f"topband={topband}, sig_levels={sig_levels}, "
         f"prec={product_precision})...")
    kw = dict(sig_k_cap=sig_k_cap, topband=topband)
    if sig_levels is not None:
        kw["sig_levels"] = sig_levels
    wt = time.time()
    with _prec_ctx(product_precision):
        resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, mbatch=mbatch,
            max_m=min(mbatch, nm), **kw,
        )
        _PHASES.setdefault("t_product_warmup_s", round(time.time() - wt, 2))

        _log("product steady pass...")
        st = time.time()
        evals, nmodes = resident.product_all_resident(
            tel, pos, neg, ls, lf, noisew, mbatch=mbatch, max_m=nm, **kw,
        )
        t_prod = time.time() - st

    if not np.isfinite(evals).all():
        raise RuntimeError("non-finite KL eigenvalues in bench product phase")
    return t_btm, t_prod, (pos, neg, ls, lf, noisew)


def _fisher_bands(tel, nbands=4):
    """Real polar-annulus band angular power spectra (host, once).

    The same construction as PSEstimation.genbands/make_clzz (reference
    psestimation.py:291-347), shrunk to ``nbands`` uniform k-bands.
    """
    from driftscan_tpu.core import psestimation as psmod
    from driftscan_tpu.core import skymodel

    edges = np.linspace(0.02, 0.25, nbands + 1)
    cr = skymodel.Corr21cm()
    cl = []
    for ks, ke in zip(edges[:-1], edges[1:]):
        ind = psmod.bandfunc_2d_polar(ks, ke, 0.0, np.pi / 2.0)
        crt = skymodel.Corr21cm(
            ps=(lambda f: (lambda k, mu: cr.ps_vv(k) * f(k, mu)))(ind),
            redshift=1.5,
        )
        crt.ps_2d = True
        cl.append(
            skymodel.im21cm_model(
                tel.lmax, tel.frequencies, 1, cr=crt, temponly=True
            )
        )
    return np.asarray(cl, dtype=np.float32)  # (nbands, L, F, F)


def fisher_phase(tel, pos, neg, ls, lf, noisew, nbands=4, nm_fisher=None):
    """Device Fisher leg: KL products + band projection + trace per m.

    Runs the full per-m chain (SVD+KL -> KL modes to sky -> band
    covariance projection -> weighted pair traces) on device for a subset
    of m-modes; returns (seconds, m-count).  Mirrors the PSExact phase
    (reference psestimation.py:701-815) on the resident path.
    """
    import jax.numpy as jnp
    from driftscan_tpu.ops import zarray as za
    from driftscan_tpu.parallel import resident

    nl = tel.lmax + 1
    nm = tel.mmax + 1
    mbatch = min(4, resident._auto_mbatch(tel))
    if nm_fisher is None:
        # Full m coverage by default: the north-star metric is
        # BTM+SVD+KL+Fisher (BASELINE.md:32-34), so the Fisher wall must
        # be a measurement, not an extrapolation.  BENCH_FISHER_M caps
        # it for quick runs.
        nm_fisher = int(os.environ.get("BENCH_FISHER_M", "0")) or nm

    clb = jnp.asarray(_fisher_bands(tel, nbands))  # (B, L, F, F)
    dt = pos.re.dtype
    nw = jnp.asarray(noisew, dtype=dt)
    lsj = jnp.asarray(ls, dtype=dt)
    lfj = jnp.asarray(lf, dtype=dt)

    @jax.jit
    def fisher_batch(pr, pi, nr, ni, mv):
        res = resident._resident_batch.__wrapped__(
            pr, pi, nr, ni, nw, lsj, lfj, mv,
            npairs=tel.npairs, nfreq=tel.nfreq, nl=nl, npol=tel.num_pol_sky,
        )
        F = tel.nfreq
        S = res.beam_re.shape[2]

        def one_m(evals, ev_re, ev_im, b_re, b_im):
            # G[k, f, l] = sum_a evecs[k, (f, a)] beam[f, a, l] (Stokes I)
            ev = za.Z(
                ev_re.reshape(-1, F, S), ev_im.reshape(-1, F, S)
            )
            bt = za.Z(b_re[..., :nl], b_im[..., :nl])
            g = za.einsum("kfa,fal->kfl", ev, bt)
            # proj[b, k, q] = G C_b G^H
            t = za.Z(
                jnp.einsum("kfl,blfh->bklh", g.re, clb),
                jnp.einsum("kfl,blfh->bklh", g.im, clb),
            )
            proj = za.einsum("bklh,qhl->bkq", t, g.conj())
            w = 1.0 / (evals + 1.0)
            d = za.Z(
                proj.re * w[None, :, None] * w[None, None, :],
                proj.im * w[None, :, None] * w[None, None, :],
            )
            af = za.Z(
                d.re.reshape(nbands, -1), d.im.reshape(nbands, -1)
            )
            bf = proj.transpose(0, 2, 1).reshape(nbands, -1)
            return za.einsum("ax,bx->ab", af, bf).re

        return jax.vmap(one_m)(
            res.evals, res.evecs_re, res.evecs_im, res.beam_re, res.beam_im
        )

    def run(ms):
        mv = np.full(mbatch, -1, np.int32)
        mv[: len(ms)] = ms
        out = fisher_batch(pos.re, pos.im, neg.re, neg.im, jnp.asarray(mv))
        return float(np.asarray(out).sum())

    _log(f"fisher warm-up compile (nbands={nbands})...")
    wt = time.time()
    run(np.arange(min(mbatch, nm)))
    _PHASES.setdefault("t_fisher_warmup_s", round(time.time() - wt, 2))

    _log("fisher steady pass...")
    st = time.time()
    acc = 0.0
    for s in range(0, nm_fisher, mbatch):
        acc += run(np.arange(s, min(s + mbatch, nm_fisher)))
    t_f = time.time() - st
    if not np.isfinite(acc):
        raise RuntimeError("non-finite Fisher accumulation in bench")
    return t_f, nm_fisher


def _product_flops(tel, nm):
    """Analytic FLOP count of the product phase (per the QR pencil design).

    Per m (n = ndof, K = nl*npf real factor columns, on 2x real
    embeddings): QR of (2(K+n), 2n); two triangular solves; one Gram +
    one 2n eigh (QDWH ~ 30 (2n)^3) per deflation level (adaptive: 1);
    triple SVD and beam build are negligible.
    """
    nl = tel.lmax + 1
    npf = tel.num_pol_sky * tel.nfreq
    n = tel.nfreq * min(nl, 2 * tel.npairs) * tel.num_pol_sky
    K = nl * npf
    n2, k2 = 2 * n, 2 * K
    qr = 2 * (k2 + n2) * n2**2 - (2 / 3) * n2**3
    solves = 2 * n2**2 * k2
    gram = 2 * n2**2 * k2
    eigh = 30 * n2**3
    return nm * (qr + solves + gram + eigh)


def _acquire_device(timeout_s: float = 600.0) -> bool:
    """Preempt any registered chain TPU client, then register the bench.

    The axon runtime serves ONE client: a concurrent chain step (A/B or
    north-star) would make the bench hang or measure garbage.  SIGINT
    is the one safe kill on this platform (python cleans up and
    releases the claim; the north-star run is window-checkpointed and
    resumes from where it left off).  Protocol details that matter:

    * the pidfile is re-read after every takeover, so a chain that
      finished one step and launched the next (new pid) is preempted
      again rather than run alongside — loop until the file holds OUR
      pid and nothing else claimed it;
    * the holder's identity is verified via /proc starttime before any
      signal (a recycled pid from a SIGKILLed client is never shot at);
    * SIGINT is sent sparingly (0 / 120 / 240 s), not every poll — a
      second KeyboardInterrupt landing inside the client's teardown is
      the hard-kill path that wedges the claim;
    * on timeout the bench does NOT start a second concurrent client:
      it returns False and main() reports an honest failure line.

    Returns True when the device is ours.  Skipped (True) when the
    bench is CPU-pinned (tests) or BENCH_NO_PREEMPT=1.
    """
    if os.environ.get("BENCH_NO_PREEMPT") == "1":
        return True
    try:
        if jax.config.jax_platforms == "cpu":
            return True
    except AttributeError:
        pass
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scratch"))
    import signal

    import _tpu_pidfile

    me = os.getpid()
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        info = _tpu_pidfile.read()
        if info is None or info[0] == me:
            _tpu_pidfile.register()
            # settle, then confirm nothing re-registered over us (the
            # chain may have launched its next step in the window
            # between its guard check and our registration)
            time.sleep(2.0)
            info = _tpu_pidfile.read()
            if info is not None and info[0] == me:
                return True
            continue
        pid, start = info
        now = _tpu_pidfile.proc_starttime(pid)
        if now is None or (start is not None and now != start):
            # stale file: holder is dead (or its pid was recycled by an
            # unrelated process — never signal it); take over
            try:
                os.unlink(_tpu_pidfile.PATH)
            except OSError:
                pass
            continue
        _log(f"preempting chain TPU client pid {pid} (SIGINT)...")
        sig_times = [time.time() + dt for dt in (0.0, 120.0, 240.0)]
        while time.time() < deadline:
            live = _tpu_pidfile.proc_starttime(pid)
            if live is None or (start is not None and live != start):
                break
            if sig_times and time.time() >= sig_times[0]:
                sig_times.pop(0)
                try:
                    os.kill(pid, signal.SIGINT)
                except ProcessLookupError:
                    break
            time.sleep(2.0)
    info = _tpu_pidfile.read()
    if info is not None and info[0] == me:
        return True
    _log(f"could not acquire the device within {timeout_s:.0f}s "
         f"(holder: {info})")
    return False


def _device_answers(timeout_s: float = 420.0) -> bool:
    """True iff the accelerator answers a tiny matmul within the timeout.

    The axon tunnel can wedge for hours after any client death.  The
    probe runs in a SEPARATE process (not a thread): round 2's rc=134
    was a daemon thread left blocked inside a wedged TPU client, which
    aborted the parent interpreter at teardown ("FATAL: exception not
    rethrown") *after* the honest failure JSON had printed.  A child
    process can be SIGKILLed without touching the parent, which has not
    initialised any backend yet on this path.
    """
    import subprocess

    # A CPU-pinned bench (tests) must NOT let the probe child touch the
    # real accelerator: the axon runtime serves one client, and a second
    # client's probe can wedge the holder's claim.  The JAX_PLATFORMS
    # env var is overridden by the axon plugin, so the pin must happen
    # inside the child via jax.config before first device use.
    pin = ""
    try:
        if jax.config.jax_platforms == "cpu":
            pin = "import jax; jax.config.update('jax_platforms', 'cpu');"
    except AttributeError:
        pass
    code = pin + (
        "import jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((64, 64), jnp.float32);"
        "print(float(np.asarray((x @ x).sum())))"
    )
    try:
        res = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return res.returncode == 0 and res.stdout.strip() != ""


def _last_known_good():
    """Headline from the newest BENCH_r*.json, so the failure line never
    points at a stale hardcoded number."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                rec = json.load(f)
            # The driver nests the bench's JSON line under "parsed"
            # (see BENCH_r01.json); accept a bare record too.
            inner = rec.get("parsed", rec) or {}
            if inner.get("value"):
                best = (
                    f"{os.path.basename(path)}: "
                    f"{inner['value']} {inner.get('unit', '')}"
                )
        except (OSError, ValueError, AttributeError):
            continue
    return best or "none recorded"


def _fail_line(error):
    out = {
        "metric": "m-modes/sec/chip (BTM+SVD+KL+Fisher)",
        "value": 0.0,
        "unit": "m-modes/s",
        "vs_baseline": 0.0,
        "failed": True,
        "detail": {
            "error": error,
            "last_known_good": _last_known_good(),
        },
    }
    # A failure record must reach a file too: chain steps gate on files,
    # and a fail-soft exit that only prints leaves nothing to inspect
    # (observed: the 02:02 bench smoke against a wedged claim
    # "succeeded" with no record file).  It goes to BENCH_RECORD_PATH
    # only when the caller pinned one explicitly; the default is a
    # DISTINCT path so a wedge can never clobber doc/bench_record.json
    # (the last good record) — and commit steps must refuse records
    # carrying "failed": true either way.
    try:
        rec_path = os.environ.get(
            "BENCH_RECORD_PATH",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "doc", "bench_fail.json",
            ),
        )
        with open(rec_path + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(rec_path + ".tmp", rec_path)
    except OSError:
        pass
    print(json.dumps(out), flush=True)


def main():
    # Fail-soft paths still print the one-line JSON record (the driver
    # parses the stdout tail regardless of rc) but exit nonzero so a
    # chain step wrapping the bench counts the run as failed and
    # retries, instead of gate-committing a 0.0 failure record.
    if not _acquire_device():
        _fail_line(
            "device held by a chain TPU client that did not yield to "
            "SIGINT within 10 min; refusing to start a second "
            "concurrent client (one-client runtime)"
        )
        sys.exit(2)
    if not _device_answers():
        _fail_line(
            "accelerator unreachable (tunnel wedge): no device answer "
            "within 7 min"
        )
        sys.exit(2)

    platform = jax.devices()[0].platform

    tel = build_telescope()
    nm = tel.mmax + 1
    nfb_total = tel.npairs * tel.nfreq
    _log(f"telescope ready: nm={nm} nfb={nfb_total} platform={platform}")

    mb_pick, sig_pick, qr_pick = _mbatch_default()
    prec_pick = _product_precision_default()
    if prec_pick:
        _PHASES.setdefault("product_precision", prec_pick)
    if sig_pick is not None:
        _PHASES.setdefault("sig_levels_pinned", sig_pick)
    if qr_pick:
        # measured-run lever only (see fpencil._CHOLQR_ROUNDS): the
        # profiler gated this round count on the bench pencil itself
        from driftscan_tpu.ops import fpencil

        fpencil._CHOLQR_ROUNDS = qr_pick
        _PHASES.setdefault("cholqr_rounds", qr_pick)
    t_btm, t_prod, state = resident_phases(
        tel, mbatch=mb_pick, sig_levels=sig_pick, product_precision=prec_pick
    )
    _log(f"BTM phase: {t_btm:.1f}s; product phase: {t_prod:.1f}s")
    mm_per_sec = nm / (t_btm + t_prod)

    # Fisher leg: FUSED into the product dispatch (the north-star path —
    # factored band covariances ride the same batch as the KL solve, so
    # the eigenvectors never leave the device and the SVD+KL work is not
    # re-paid; resident.product_all_resident band_lt,
    # tests/test_fisher_resident.py pins it against the dense
    # quadratic-estimator).  The PRIMARY headline spans ALL FOUR phases
    # (BTM+SVD+KL+Fisher) — the BASELINE.md:32-34 north-star metric: one
    # fused pass produces spectra AND the Fisher, so the 4-phase wall is
    # t_btm + t_fused.  The three-phase rate is kept in the detail as
    # `m_per_s_btm_svd_kl` for round-to-round comparison.  If the Fisher
    # leg fails, the headline falls back to the three-phase rate and
    # says so.
    fisher_m_per_s = None
    with_fisher = None
    t_f = None
    try:
        from driftscan_tpu.parallel import mstep, resident

        pos, neg, ls, lf, noisew = state
        clb = _fisher_bands(tel)
        band_lt = mstep.band_factor_table(
            iter(clb), out_dtype=np.float32, rank_rtol=1e-9
        )
        mb = mb_pick or resident._auto_mbatch(tel)
        fkw = dict(band_lt=band_lt, ps_threshold=0.1)
        if sig_pick is not None:
            fkw["sig_levels"] = sig_pick
        _log("fused product+fisher warm-up compile...")
        wt = time.time()
        with _prec_ctx(prec_pick):
            resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, mbatch=mb,
                max_m=min(mb, nm), **fkw,
            )
            _PHASES.setdefault(
                "t_fisher_warmup_s", round(time.time() - wt, 2)
            )
            _log("fused product+fisher steady pass...")
            st = time.time()
            ev_f, _nm, fish = resident.product_all_resident(
                tel, pos, neg, ls, lf, noisew, mbatch=mb, **fkw,
            )
            t_fused = time.time() - st
        if not np.isfinite(fish).all():
            raise RuntimeError("non-finite fused Fisher")
        t_f = max(t_fused - t_prod, 0.0)  # incremental Fisher cost
        fisher_m_per_s = nm / t_fused
        _log(
            f"fused product+fisher: {t_fused:.1f}s for {nm} m "
            f"(fisher increment {t_f:.1f}s)"
        )
        with_fisher = nm / (t_btm + t_fused)
        _PHASES.setdefault("t_product_fisher_fused_s", round(t_fused, 2))
    except Exception as exc:  # falls back to the three-phase headline
        _log(f"fisher leg failed: {exc!r}")
    del state

    # Polarised leg (BENCH_POL=0 disables): a small polarised cylinder
    # through the same resident BTM+product path — the npol=4 triple-SVD
    # filtering measured on chip.  Never fails the bench.
    pol_detail = None
    if os.environ.get("BENCH_POL", "1") == "1" and platform != "cpu":
        try:
            # the cholqr-rounds pick was gated on the primary pencil
            # only; the polarised leg runs the library default (the CPU
            # comparison leg below re-applies the pick — it must mirror
            # the chip headline's configuration exactly)
            if qr_pick:
                from driftscan_tpu.ops import fpencil

                fpencil._CHOLQR_ROUNDS = None
            tel_p = build_pol_telescope()
            nm_p = tel_p.mmax + 1
            _log(
                f"polarised leg: nm={nm_p} nfb={tel_p.npairs * tel_p.nfreq} "
                f"npol={tel_p.num_pol_sky}"
            )
            t_btm_p, t_prod_p, state_p = resident_phases(tel_p)
            del state_p
            pol_detail = {
                "pol_m_per_s": round(nm_p / (t_btm_p + t_prod_p), 3),
                "pol_nm": nm_p,
                "pol_t_btm_s": round(t_btm_p, 2),
                "pol_t_product_s": round(t_prod_p, 2),
            }
            _log(
                f"polarised leg: btm {t_btm_p:.1f}s product {t_prod_p:.1f}s "
                f"-> {pol_detail['pol_m_per_s']} m/s"
            )
        except Exception as exc:
            _log(f"polarised leg failed: {exc!r}")
        finally:
            if qr_pick:
                from driftscan_tpu.ops import fpencil

                fpencil._CHOLQR_ROUNDS = qr_pick

    # CPU comparison on a subset of the same work, extrapolated.  The
    # backend override is always restored (try/finally) so a failing CPU
    # leg cannot poison the process state for anything that follows.
    # The denominator's basis is recorded in detail.cpu_leg (VERDICT r4
    # item 6): this bench host exposes ONE core, so the honest measured
    # denominator is single-process CPU throughput — a 64-rank MPI
    # comparison cannot be run here and vs_baseline must be read as
    # "per CPU core", not "per 64-rank job".
    vs_baseline = None
    cpu_detail = None
    if platform != "cpu":
        import driftscan_tpu.backend as backend

        def _reset_backend_caches():
            backend.split_complex.cache_clear()
            backend.has_device_fft.cache_clear()

        prev_env = os.environ.get("DRIFTSCAN_TPU_SPLIT_COMPLEX")
        try:
            with jax.default_device(jax.devices("cpu")[0]):
                os.environ["DRIFTSCAN_TPU_SPLIT_COMPLEX"] = "0"
                _reset_backend_caches()

                tel_c = build_telescope()
                nsub = max(8, nm // 12)
                n_units = max(16, nfb_total // 6)
                stride = int(np.ceil(nfb_total / n_units))
                n_done = len(range(0, nfb_total, stride))
                # Medianize: the host-load swing on this leg was measured
                # at 0.7-1.6 mm/s across runs; 3 repeats pin it down.
                reps = int(os.environ.get("BENCH_CPU_REPEATS", "3"))
                btms, prods = [], []
                _st = None
                for _ in range(reps):
                    del _st
                    t_btm_sub, t_prod_sub, _st = resident_phases(
                        tel_c, max_m=nsub, max_units=n_units
                    )
                    btms.append(t_btm_sub)
                    prods.append(t_prod_sub)
                t_btm_cpu = float(np.median(btms)) * nfb_total / n_done
                t_prod_cpu = float(np.median(prods)) * nm / nsub

                # Fused product+fisher subset on the last repeat's state,
                # extrapolated — the same fused pass as the chip headline
                # so the ratio compares the same four phases.
                t_fused_cpu = None
                if with_fisher is not None:
                    try:
                        from driftscan_tpu.parallel import mstep, resident

                        nf_sub = max(4, nsub // 4)
                        pos_c, neg_c, ls_c, lf_c, nw_c = _st
                        clb_c = _fisher_bands(tel_c)
                        blt_c = mstep.band_factor_table(
                            iter(clb_c), out_dtype=np.float32, rank_rtol=1e-9
                        )
                        mb_c = resident._auto_mbatch(tel_c)
                        resident.product_all_resident(
                            tel_c, pos_c, neg_c, ls_c, lf_c, nw_c,
                            mbatch=mb_c, max_m=min(mb_c, nf_sub),
                            band_lt=blt_c, ps_threshold=0.1,
                        )
                        st = time.time()
                        resident.product_all_resident(
                            tel_c, pos_c, neg_c, ls_c, lf_c, nw_c,
                            mbatch=mb_c, max_m=nf_sub,
                            band_lt=blt_c, ps_threshold=0.1,
                        )
                        t_fused_cpu = (time.time() - st) * nm / nf_sub
                    except Exception as exc:
                        _log(f"CPU fused fisher subset failed: {exc!r}")
                del _st

                cpu_rate = nm / (t_btm_cpu + t_prod_cpu)
                cpu_detail = {
                    # basis of the vs_baseline denominator, spelled out
                    "nproc": 1,
                    "host_cores": os.cpu_count(),
                    "nm_subset": int(nsub),
                    "fb_units_measured": int(n_done),
                    "fb_units_total": int(n_units),
                    "reps_medianized": int(reps),
                    "extrapolated_to_full_nm": True,
                    "t_btm_cpu_extrap_s": round(t_btm_cpu, 1),
                    "t_product_cpu_extrap_s": round(t_prod_cpu, 1),
                }
                if with_fisher is not None and t_fused_cpu is not None:
                    cpu_rate4 = nm / (t_btm_cpu + t_fused_cpu)
                    vs_baseline = with_fisher / cpu_rate4
                    cpu_detail["t_fused_cpu_extrap_s"] = round(t_fused_cpu, 1)
                    cpu_detail["cpu_m_per_s_4phase"] = round(cpu_rate4, 4)
                    _log(
                        f"CPU leg (median of {reps}): btm {t_btm_cpu:.1f}s, "
                        f"product {t_prod_cpu:.1f}s, fused prod+fisher "
                        f"{t_fused_cpu:.1f}s (extrap) -> "
                        f"{cpu_rate4:.3f} mm/s (4-phase)"
                    )
                else:
                    vs_baseline = mm_per_sec / cpu_rate
                    cpu_detail["cpu_m_per_s_3phase"] = round(cpu_rate, 4)
                    _log(
                        f"CPU leg (median of {reps}): btm {t_btm_cpu:.1f}s, "
                        f"product {t_prod_cpu:.1f}s (extrap) "
                        f"-> {cpu_rate:.3f} mm/s"
                    )
        except Exception as exc:  # CPU leg is best-effort
            _log(f"CPU baseline leg failed: {exc!r}")
            vs_baseline = None
        finally:
            if prev_env is None:
                os.environ.pop("DRIFTSCAN_TPU_SPLIT_COMPLEX", None)
            else:
                os.environ["DRIFTSCAN_TPU_SPLIT_COMPLEX"] = prev_env
            _reset_backend_caches()

    product_tflops = _product_flops(tel, nm) / t_prod / 1e12
    # MFU denominator: nominal chip peak in the matmul dtype.  The hot
    # path runs f32 with matmul precision "highest" (3-pass bf16), so the
    # honest ceiling is bf16-peak / 3; override with BENCH_PEAK_TFLOPS.
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "0")) or (
        197.0 / 3.0 if platform not in ("cpu",) else None
    )
    phases4 = with_fisher is not None
    # The metric string is FROZEN (round 4+) so the BENCH_r* series is
    # machine-comparable; shape and any phase failure live in detail.
    out = {
        "metric": "m-modes/sec/chip (BTM+SVD+KL+Fisher)",
        "value": round(with_fisher if phases4 else mm_per_sec, 3),
        "unit": "m-modes/s",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "detail": {
            "platform": platform,
            "telescope": "unpolarised cylinder",
            "nm": nm,
            "nfb": nfb_total,
            "fisher_leg": "ok" if phases4 else "failed: value is 3-phase BTM+SVD+KL only",
            # steady-state phase walls (post warm-up)
            "t_btm_s": round(t_btm, 2),
            "t_product_s": round(t_prod, 2),
            # three-phase rate, comparable with BENCH_r01/r02 headlines
            "m_per_s_btm_svd_kl": round(mm_per_sec, 3),
            # analytic product-phase flop rate (eigh-dominated: QDWH-eig
            # runs far below matmul peak on any platform), plus its MFU
            # against the nominal f32-equivalent chip peak
            "product_tflops": round(product_tflops, 3),
            **(
                {"product_mfu_pct": round(100.0 * product_tflops / peak, 2)}
                if peak
                else {}
            ),
            **(
                {"fisher_m_per_s": round(fisher_m_per_s, 2)}
                if fisher_m_per_s
                else {}
            ),
            **({"t_fisher_s": round(t_f, 2)} if t_f else {}),
            **(pol_detail or {}),
            **({"cpu_leg": cpu_detail} if cpu_detail else {}),
            # compile/warm-up split (cold unless the persistent
            # compilation cache in .jax_cache is populated)
            **_PHASES,
        },
    }
    # Durable copy of the record (atomic): downstream tooling reads the
    # file instead of scraping the last stdout line, which any trailing
    # warning would corrupt.
    try:
        rec_path = os.environ.get(
            "BENCH_RECORD_PATH",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "doc", "bench_record.json",
            ),
        )
        with open(rec_path + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(rec_path + ".tmp", rec_path)
    except OSError as exc:
        _log(f"bench record file write failed: {exc!r}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
