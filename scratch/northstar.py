"""North-star run: 256 freqs x mmax ~1000, polarised cylinder (BASELINE.md).

Full BTM + SVD + KL + Fisher product generation on one chip,
device-resident, with the bucketed dispatcher compacting the high-m
pencils (the 400-800 MHz band thins linearly in frequency above
m ~ 503).  The Fisher phase is fused into the product dispatch
(resident Fisher, factored band covariances); the band factor table is
cached at /tmp/ns_band_lt.npz (scratch/ns_bands_probe.py NS_BANDS_ALL=1
builds it host-side).  Logs per-phase wall-clock and writes a JSON
record for the design doc.
"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
# windowed Legendre tables: nside 1024 / lmax 1006 / width 63 is
# ~1.06 GB, nside 512 ~0.27 GB; allow both plus slack
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
# 2 units per chunk at nside 1024 (~1.6 GB of pixel temporaries per
# polarised unit): halves the per-chunk host dispatch overhead vs
# take=1 while staying inside HBM next to the 4.15 GB window tables
os.environ.setdefault("DRIFTSCAN_TPU_SHT_BUDGET_GB", "4.5")
import numpy as np, jax, jax.numpy as jnp

# NS_SMOKE=1: tiny-telescope CPU rehearsal of this script's *logic*
# (windowing, checkpoint save/restore, engine tagging, record writing)
# so a bug here can't cost hours of the real device run.  Uses its own
# checkpoint/cache/output paths and pins the CPU backend in-script
# (JAX_PLATFORMS is ignored on this runtime).
SMOKE = os.environ.get("NS_SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile  # script dir is sys.path[0]

    _tpu_pidfile.register()

if not SMOKE:  # CPU AOT cache entries are host-feature-pinned; skip for smoke
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht
from driftscan_tpu.parallel import mstep, resident

T0 = time.time()
# NS_DEADLINE (unix seconds): stop dispatching new windows past the
# deadline and write a .partial record — the run must never hold the
# TPU into the round's final bench (same contract as northstar2.py).
DEADLINE = float(os.environ.get("NS_DEADLINE", "0")) or None
def log(msg):
    print(f"[ns +{time.time()-T0:7.1f}s] {msg}", flush=True)

if SMOKE:
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=2, freq_start=400.0, freq_end=410.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=3.0, num_feeds=2,
        feed_spacing=1.0, tsys=50.0, single_precision=True,
    ))
else:
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=256, freq_start=400.0, freq_end=800.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=30.0, num_feeds=1,
        feed_spacing=6.0, tsys=50.0, single_precision=True,
    ))
nm = tel.mmax + 1
S = min(tel.lmax + 1, 2 * tel.npairs)
rec = dict(nfreq=tel.nfreq, mmax=tel.mmax, lmax=tel.lmax,
           npairs=tel.npairs, npol=tel.num_pol_sky, ndofmax=tel.nfreq * S,
           nfb=tel.npairs * tel.nfreq)
log(f"north-star telescope: {rec}")

log("covariances...")
st = time.time()
# container /tmp is wiped between driver sessions (2026-08-20: lost the
# three completed windows + both host caches overnight); caches that
# are cheap to rebuild live in the repo-local .cache (survives within a
# container), while the window checkpoints move to a *git-tracked* dir
# the chain commits after every window — the repo tree is the only
# storage that survives a container swap.
os.makedirs("/root/repo/.cache", exist_ok=True)
_cov_cache = ("/tmp/ns_smoke_cov.npz" if SMOKE
              else "/root/repo/.cache/ns_cov_cache.npz")
if os.path.exists(_cov_cache):
    z = np.load(_cov_cache)
    ls, lf, noisew = z["ls"], z["lf"], z["noisew"]
    log("covariance factors loaded from cache")
else:
    cl_s, cl_n, noisew, _ = bench._covariances(tel)
    ls, lf = mstep.prepare_cl_factors(cl_s, cl_n)
    np.savez(_cov_cache, ls=ls, lf=lf, noisew=noisew)
rec["t_cov_s"] = round(time.time() - st, 1)
rec["K_signal"], rec["K_fg"] = int(ls.shape[-1]), int(lf.shape[-1])
log(f"covariances {rec['t_cov_s']}s (factor widths: signal {ls.shape[-1]}, fg {lf.shape[-1]})")

bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]

# KL engine for the product phase.  The on-chip A/B at bench scale
# (doc/topband_ab.json) failed the top-band engine's accuracy gate:
# retained-mode sets diverge from the exact engine (max rel 0.24 at the
# band edge; the filter-precision sweep even flipped a retained mode to
# zero), so the flagship run follows the same accuracy-gated adoption
# rule as the bench and defaults to the exact engine.  NS_TOPBAND=1
# opts back in (certificates + exact fallback still apply); the
# telescope here is feed-sparse (S = 2*npairs is small), so the exact
# QDWH eigh stays affordable at 256 freqs.
NS_TOPBAND = os.environ.get("NS_TOPBAND", "0") == "1"
rec["engine"] = "topband" if NS_TOPBAND else "exact"
log(f"product engine: {rec['engine']}")

# Engine defaults: adopt every accuracy-gated on-chip pick the bench
# uses (SHT precision, whitening application, beam_factor lowering,
# filter precision) via the shared resolver — the chain runs the A/Bs
# before this, so the records are stable for the whole run; env always
# overrides, smoke never reads them.  The effective picks are baked
# into the checkpoint filenames so a resume after a pick changes
# recomputes instead of silently mixing numerics across windows.
if not SMOKE:
    _picks = bench._engine_defaults()
    _picks.pop("topband", None)  # NS_TOPBAND governs the engine here
# Record the EFFECTIVE lever values (module globals after adoption),
# not the resolver's adopted-only dict: an env-pinned lever (e.g.
# DRIFTSCAN_TPU_WHITEN_IMPL=refined) never appears in the dict, and a
# checkpoint keyed on the stale default could be silently reused by a
# later resume under different numerics.
from driftscan_tpu.ops import fpencil as _fp
from driftscan_tpu.ops import sht as _sht

# None inherits jax_default_matmul_precision=highest (pinned at import)
rec["sht_precision"] = _sht._SHT_PRECISION or "highest"
rec["whiten"] = _fp._WHITEN_IMPL
rec["beam_factor"] = _fp._BEAM_FACTOR_IMPL
log(f"engine picks: sht={rec['sht_precision']} whiten={rec['whiten']} "
    f"beam_factor={rec['beam_factor']}")

# Fisher phase (BASELINE.md north star includes it): fused into the
# product dispatch via the factored band covariances.  NS_FISHER=0
# disables; a missing/unbuildable band table degrades to fisher-off
# rather than losing the headline run.
NS_FISHER = os.environ.get("NS_FISHER", "1") == "1"
band_lt = None
if NS_FISHER:
    _blt_cache = ("/tmp/ns_smoke_band_lt.npz" if SMOKE
                  else "/root/repo/.cache/ns_band_lt.npz")
    try:
        if os.path.exists(_blt_cache):
            band_lt = np.load(_blt_cache)["band_lt"]
        else:
            from driftscan_tpu.core import psestimation, skymodel

            st = time.time()
            nb = 3 if SMOKE else 10
            edges_k = np.linspace(0.0, 0.4, nb + 1)
            cr = skymodel.Corr21cm()
            cr.ps_2d = False

            def _band_cls():
                for ks, ke in zip(edges_k[:-1], edges_k[1:]):
                    bf = psestimation.bandfunc_2d_polar(ks, ke, 0.0, np.pi / 2)
                    crt = skymodel.Corr21cm(
                        ps=(lambda k, mu, f=bf: cr.ps_vv(k) * f(k, mu)),
                        redshift=1.5,
                    )
                    crt.ps_2d = True
                    yield skymodel.im21cm_model(
                        tel.lmax, tel.frequencies, tel.num_pol_sky,
                        cr=crt, temponly=True,
                    )

            band_lt = mstep.band_factor_table(
                _band_cls(), out_dtype=np.float32, rank_rtol=1e-9
            )
            np.savez(_blt_cache, band_lt=band_lt, k_edges=edges_k)
            log(f"band factor table built {time.time()-st:.1f}s")
    except Exception as exc:  # pragma: no cover - defensive for the run
        log(f"fisher band table unavailable ({exc!r}); fisher disabled")
        band_lt = None
        NS_FISHER = False
rec["fisher"] = bool(NS_FISHER and band_lt is not None)
if band_lt is not None:
    rec["fisher_bands"] = int(band_lt.shape[0])
    log(f"fisher: {band_lt.shape[0]} bands, table "
        f"{band_lt.nbytes/2**20:.0f} MiB {band_lt.shape}")

# The full (l, m) tables are 66 GB here (nu*npol*nl*nm, 4 f32 planes) —
# over the 15.75 GB HBM — so the run streams m-windows: each window's
# BTM costs its share of the SHT (the m-chunk scan just starts at m0)
# plus a re-run of the pixel-space beam products.
# 20 windows (not 16): the first real window-1 compile OOM'd at 16.37 G
# vs 15.75 G HBM (2026-08-19, beam-bank kernel next to the window
# tables); 66 GB / 20 = 3.3 GB tables + the 4.5 GB SHT chunk budget
# leaves ~1.5 GB of the overshoot as headroom
W = 3 if SMOKE else 20
edges = np.linspace(0, nm, W + 1).astype(int)
rec["m_windows"] = W
t_btm = t_prod = 0.0
evs, nmods = [], []
# per-window checkpoints: a device fault mid-run (the tunnel wedges for
# tens of minutes on any client death) must not cost completed windows
_ckpt_dir = ("/tmp/ns_smoke_windows" if SMOKE
             else "/root/repo/ckpt/ns_windows")
os.makedirs(_ckpt_dir, exist_ok=True)
fish_total = (
    np.zeros((band_lt.shape[0],) * 2, np.complex128) if rec["fisher"] else None
)
windows_done = 0
for wi, (m0, m1) in enumerate(zip(edges[:-1], edges[1:])):
    ck = (f"{_ckpt_dir}/w{wi:02d}_{m0}_{m1}_{rec['engine']}"
          f"_{rec['sht_precision']}_{rec['whiten']}_{rec['beam_factor']}"
          f"_f{int(rec['fisher'])}.npz")
    if os.path.exists(ck):
        try:
            z = np.load(ck)
            ev_r, nmo_r = z["ev"], z["nmo"]
            tb_r, tp_r = float(z["tb"]), float(z["tp"])
            fish_r = z["fish"] if rec["fisher"] else None
        except Exception as exc:  # corrupt/partial file: recompute
            log(f"window {wi+1}/{W}: bad checkpoint ({exc!r}); recomputing")
            os.unlink(ck)
        else:
            evs.append(ev_r); nmods.append(nmo_r)
            t_btm += tb_r; t_prod += tp_r
            if fish_r is not None:
                fish_total += fish_r
            windows_done += 1
            log(f"window {wi+1}/{W} m=[{m0},{m1}): restored from checkpoint")
            continue
    if DEADLINE and time.time() > DEADLINE:
        log(f"deadline reached before window {wi+1}/{W}; stopping "
            f"({windows_done} windows banked)")
        break
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig, m_range=(int(m0), int(m1)))
    _ = float(np.asarray(pos.re.sum()))
    tb = time.time() - st
    # per-window Legendre tables are never reused once the window's SHT
    # is done: free their HBM before the product phase allocates
    sht.clear_legendre_cache()
    t_btm += tb
    st = time.time()
    fkw = (
        dict(band_lt=band_lt, ps_threshold=0.1) if rec["fisher"] else {}
    )
    out = resident.product_all_resident(
        tel, pos, neg, ls, lf, noisew, bucket=True, m_range=(int(m0), int(m1)),
        topband=NS_TOPBAND, kl_cut=0.1, **fkw,
    )
    if rec["fisher"]:
        ev, nmo, fish = out
        fish_total += fish
    else:
        ev, nmo = out
        fish = None
    tp = time.time() - st
    t_prod += tp
    del pos, neg
    evs.append(ev)
    nmods.append(nmo)
    # write-then-rename: a SIGINT (bench preemption) mid-write must not
    # leave a partial npz that poisons every later resume
    extra_ck = {"fish": fish} if fish is not None else {}
    np.savez(ck + ".tmp.npz", ev=ev, nmo=nmo, tb=tb, tp=tp, **extra_ck)
    os.replace(ck + ".tmp.npz", ck)
    windows_done += 1
    log(f"window {wi+1}/{W} m=[{m0},{m1}): btm {tb:.1f}s product {tp:.1f}s "
        f"max_ev {float(ev.max()):.3e} retained {int((ev > 0.1).sum())}")
    if not SMOKE:
        # the repo tree is the only cross-container storage: commit the
        # window the moment it lands (retry across transient index-lock
        # contention with the interactive session; never fail the run)
        import subprocess
        for _try in range(3):
            r = subprocess.run(
                ["git", "-C", "/root/repo", "add", "ckpt/ns_windows"],
                capture_output=True)
            if r.returncode == 0:
                r = subprocess.run(
                    ["git", "-C", "/root/repo", "commit", "-q",
                     "-m", f"North-star window {wi+1}/{W} checkpoint",
                     "--", "ckpt/ns_windows"], capture_output=True)
            if r.returncode == 0:
                break
            time.sleep(5)
        else:
            log(f"window {wi+1}: checkpoint commit failed "
                f"({r.stderr.decode()[:200]})")
rec["windows_done"] = windows_done
rec["partial"] = windows_done < W
evals = np.concatenate(evs) if evs else np.zeros((0, 1))
nmodes = np.concatenate(nmods) if nmods else np.zeros(0, int)
rec["t_btm_s"] = round(t_btm, 1)
rec["t_product_s"] = round(t_prod, 1)
if evals.size:
    rec["finite"] = bool(np.isfinite(evals).all())
    rec["max_eval"] = float(evals.max())
    rec["retained_modes"] = int((evals > 0.1).sum())
    rec["m_done"] = int(evals.shape[0])
    rec["rate_m_per_s"] = round(evals.shape[0] / max(t_btm + t_prod, 1e-9), 3)
if NS_TOPBAND:
    # converged (basis width, levels) per pencil dimension — records how
    # hard the certificate had to escalate at north-star conditioning
    rec["topband_state"] = {str(k): list(v) for k, v in resident._TB_STATE.items()}
if fish_total is not None:
    rec["fisher_finite"] = bool(np.isfinite(fish_total).all())
    rec["fisher_k"] = int(resident._FISHER_K[0])
    rec["fisher_diag"] = [float(x) for x in np.real(np.diag(fish_total))]
    _fish_path = ("/tmp/ns_smoke_fisher.npz" if SMOKE
                  else "/root/repo/doc/northstar_fisher.npz")
    np.savez(_fish_path, fisher=fish_total)
    log(f"fisher saved to {_fish_path}; diag head "
        f"{np.real(np.diag(fish_total))[:3]}")
log(f"TOTAL: btm {t_btm:.1f}s product {t_prod:.1f}s; windows "
    f"{windows_done}/{W}; rate {rec.get('rate_m_per_s')} m/s; "
    f"finite={rec.get('finite')} max_eval={rec.get('max_eval')} "
    f"retained={rec.get('retained_modes')}")

_rec_path = ("/tmp/ns_smoke_record.json" if SMOKE
             else "/root/repo/doc/northstar_run.json")
# a partial record must not gate the chain as "done": keep a .partial
# suffix until every window is banked
if rec["partial"] and not SMOKE:
    _rec_path += ".partial"
with open(_rec_path, "w") as f:
    json.dump(rec, f, indent=1)
log(f"record written to {_rec_path}")
