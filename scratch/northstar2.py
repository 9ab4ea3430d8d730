"""North-star 2: PRODUCTION-SHAPED baseline axis (VERDICT r3 item 3).

The first north-star run (scratch/northstar.py) hits 256 freqs and
mmax 1006 but with num_feeds=1 (npairs=4, svd_len=8) its per-m SVD
stage is nearly degenerate.  This run flips the trade: a 2-cylinder x
9-feed polarised array — npairs=100, ntel=200, svd_len=200 per freq,
the reference's hard axis ntel = 2*npairs
(/root/reference/drift/core/beamtransfer.py:502-676) — at 16 freqs and
mmax ~313, so the per-m triple-SVD operates on production-shaped
(ntel x npol*nl) = (200 x 1256) blocks and the KL pencil is
ndofmax = 3200 (vs 2048 before).  The HBM/wall ceiling that forces
the (freqs, mmax) reduction is documented in doc/design.md.

Same machinery as northstar.py: window-checkpointed (git-committed),
fused Fisher, engine picks from the decision records, NS2_SMOKE CPU
rehearsal.  NS2_DEADLINE (unix seconds) stops dispatching new windows
past the deadline and writes a partial record — the run must never
hold the TPU into the round's final bench.
"""
import json, os, subprocess, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("DRIFTSCAN_TPU_LEGENDRE_CACHE_GB", "2.0")
os.environ.setdefault("DRIFTSCAN_TPU_SHT_BUDGET_GB", "4.0")
import numpy as np, jax

SMOKE = os.environ.get("NS2_SMOKE") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
else:
    import _tpu_pidfile

    _tpu_pidfile.register()

if not SMOKE:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
from driftscan_tpu.telescope import cylinder
from driftscan_tpu.ops import sht
from driftscan_tpu.parallel import mstep, resident

T0 = time.time()
DEADLINE = float(os.environ.get("NS2_DEADLINE", "0")) or None


def log(msg):
    print(f"[ns2 +{time.time()-T0:7.1f}s] {msg}", flush=True)


# Presets: "ns2" (production-shaped axis — big per-m blocks) and
# "ns1b" (scale axis — mmax > 1000 with real KL physics: 2x4 feeds at
# 32 coarse channels over the full 400-800 MHz band, replacing the
# retain-zero 2x1-feed ns1; VERDICT r4 item 7).  ns1b's coarse
# channels (delnu 12.5 MHz vs ns1's 1.56) cut the per-channel thermal
# noise 8x, and 40 baseline pairs replace ns1's 4 — the regime where
# the 2x1 toy retained nothing by physics (design.md section 15).
PRESET = os.environ.get("NS2_PRESET", "ns2")
if SMOKE:
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=2, freq_start=400.0, freq_end=410.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=3.0, num_feeds=3,
        feed_spacing=1.0, tsys=50.0, single_precision=True,
    ))
elif PRESET == "ns1b":
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=32, freq_start=400.0, freq_end=800.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=31.0, num_feeds=4,
        feed_spacing=1.5, tsys=50.0, single_precision=True,
        ndays=int(os.environ.get("NS_NDAYS", "733")),
    ))
else:
    tel = cylinder.PolarisedCylinderTelescope.from_config(dict(
        num_freq=16, freq_start=400.0, freq_end=500.0, freq_mode="edge",
        num_cylinders=2, cylinder_width=15.0, num_feeds=9,
        feed_spacing=1.0, tsys=50.0, single_precision=True,
    ))
# per-preset artifact paths (smoke overrides below keep /tmp)
_TAG = "ns2" if PRESET == "ns2" else PRESET
_REC_PATH = {
    "ns2": "/root/repo/doc/northstar2_run.json",
    "ns1b": "/root/repo/doc/northstar1b_run.json",
}[_TAG]
_FISH_PATH = {
    "ns2": "/root/repo/doc/northstar2_fisher.npz",
    "ns1b": "/root/repo/doc/northstar1b_fisher.npz",
}[_TAG]
_CKPT_GIT_DIR = f"ckpt/{_TAG}_windows"
nm = tel.mmax + 1
S = min(4 * (tel.lmax + 1), 2 * tel.npairs)
rec = dict(kind=("production-shaped" if _TAG == "ns2" else "scale-axis"),
           nfreq=tel.nfreq, mmax=tel.mmax,
           lmax=tel.lmax, npairs=tel.npairs, npol=tel.num_pol_sky,
           ntel=2 * tel.npairs, svd_len=S, ndofmax=tel.nfreq * S,
           nfb=tel.npairs * tel.nfreq, ndays=tel.ndays)
log(f"{rec['kind']} telescope: {rec}")

log("covariances...")
st = time.time()
os.makedirs("/root/repo/.cache", exist_ok=True)
_cov_cache = ("/tmp/ns2_smoke_cov.npz" if SMOKE
              else f"/root/repo/.cache/{_TAG}_cov_cache.npz")
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
log(f"covariances {rec['t_cov_s']}s (factor widths: signal {ls.shape[-1]}, "
    f"fg {lf.shape[-1]})")

bl = np.arange(tel.npairs); fi = np.arange(tel.nfreq)
blg, fig = [x.ravel() for x in np.meshgrid(bl, fi, indexing="ij")]

# Engine: exact (the top-band A/B failed its accuracy gate on chip,
# doc/topband_ab.json); NS2_TOPBAND=1 opts back in.  At ndof=3200 the
# interleaved eigh dominates the product step, so a *passing* on-chip
# topband record is worth a lot here: doc/ns2_overrides.json (written
# only after doc/topband_forensic_chip.json gates green) can flip the
# engine without editing the running chain.  Env always wins.
_ovr = {}
try:
    with open("/root/repo/doc/ns2_overrides.json") as _f:
        _ovr = json.load(_f)
except (OSError, ValueError):
    pass
if _ovr.get("tb_start_frac") and not os.environ.get(
    "DRIFTSCAN_TPU_TB_START_FRAC"
):
    from driftscan_tpu.parallel import resident as _res_mod

    _res_mod._TB_START_FRAC = int(_ovr["tb_start_frac"])
NS2_TOPBAND = (
    os.environ["NS2_TOPBAND"] == "1"
    if "NS2_TOPBAND" in os.environ
    else bool(_ovr.get("topband", False))
)
rec["engine"] = "topband" if NS2_TOPBAND else "exact"
log(f"product engine: {rec['engine']}")

if not SMOKE:
    _picks = bench._engine_defaults()
    _picks.pop("topband", None)
from driftscan_tpu.ops import fpencil as _fp
from driftscan_tpu.ops import sht as _sht

rec["nside_cap"] = int(os.environ.get("DRIFTSCAN_TPU_NSIDE_CAP", "0") or 0)
rec["sht_precision"] = _sht._SHT_PRECISION or "highest"
rec["whiten"] = _fp._WHITEN_IMPL
rec["beam_factor"] = _fp._BEAM_FACTOR_IMPL
log(f"engine picks: sht={rec['sht_precision']} whiten={rec['whiten']} "
    f"beam_factor={rec['beam_factor']}")

NS2_FISHER = os.environ.get("NS2_FISHER", "1") == "1"
band_lt = None
if NS2_FISHER:
    _blt_cache = ("/tmp/ns2_smoke_band_lt.npz" if SMOKE
                  else f"/root/repo/.cache/{_TAG}_band_lt.npz")
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
    except Exception as exc:  # defensive: fisher-off beats losing the run
        log(f"fisher band table unavailable ({exc!r}); fisher disabled")
        band_lt = None
        NS2_FISHER = False
rec["fisher"] = bool(NS2_FISHER and band_lt is not None)
if band_lt is not None:
    rec["fisher_bands"] = int(band_lt.shape[0])
    log(f"fisher: {band_lt.shape[0]} bands, table "
        f"{band_lt.nbytes/2**20:.0f} MiB {band_lt.shape}")

# m-windows: the (l, m) tables are nu*npol*nl*nm * 16 B (pos+neg f32
# pairs) ~ 10 GB here — streamed as windows like northstar.py.  At
# ~1.4 GB of tables per 45-m window the SHT budget + pencil workspace
# (n=3200 eigh) fit comfortably.
#
# Every window gets the SAME static width (the last one padded past
# mmax: SHT coefficients at m > lmax are exact zeros and the padded
# m's retain nothing, so they are trimmed from the results below).
# Round 4's np.linspace edges alternated widths 44/45, which recompiled
# the whole window program mid-run — window 2's recompile outlived the
# stall watchdog and cost the session (doc/ROUND4_STATE.md).  One width
# = one compiled program for all 7 windows.
W = 3 if SMOKE else int(
    os.environ.get("NS2_WINDOWS", "7" if _TAG == "ns2" else "32")
)
# stop dispatching after this many windows are banked (the scale
# axis only needs its first windows committed to demonstrate real
# retained-mode physics at mmax > 1000; the rest can bank later)
MAX_WINDOWS = int(os.environ.get("NS2_MAX_WINDOWS", "0")) or None
# skip dispatch below this window index (restored checkpoints still count)
WINDOW_OFFSET = int(os.environ.get("NS2_WINDOW_OFFSET", "0"))
WIDTH = -(-nm // W)  # ceil: W * WIDTH >= nm
edges = np.arange(W + 1) * WIDTH
rec["m_windows"] = W
rec["m_window_width"] = int(WIDTH)
t_btm = t_prod = 0.0
evs, nmods = [], []
_ckpt_dir = ("/tmp/ns2_smoke_windows" if SMOKE
             else f"/root/repo/{_CKPT_GIT_DIR}")
os.makedirs(_ckpt_dir, exist_ok=True)
fish_total = (
    np.zeros((band_lt.shape[0],) * 2, np.complex128) if rec["fisher"] else None
)
windows_done = 0
for wi, (m0, m1) in enumerate(zip(edges[:-1], edges[1:])):
    m0, m1 = int(m0), int(m1)
    # rows [m0, m_real) are physical; [m_real, m1) is the static-width
    # padding of the last window (zero beams, retain nothing)
    m_real = min(m1, nm)
    ck = (f"{_ckpt_dir}/w{wi:02d}_{m0}_{m1}_{rec['engine']}"
          f"_{rec['sht_precision']}_{rec['whiten']}_{rec['beam_factor']}"
          f"_f{int(rec['fisher'])}.npz")
    if os.path.exists(ck):
        try:
            z = np.load(ck)
            ev_r, nmo_r = z["ev"], z["nmo"]
            tb_r, tp_r = float(z["tb"]), float(z["tp"])
            fish_r = z["fish"] if rec["fisher"] else None
        except Exception as exc:
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
    if wi < WINDOW_OFFSET:
        # scale-axis cherry-pick: dispatch starts at this window index
        # (committed checkpoints below the offset still restore above).
        # The KL retention is concentrated at mid m — ns2's own window 1
        # held 15 of its 1303 retained modes — so banking a mid-m window
        # first demonstrates the retained-mode physics per chip-hour.
        continue
    if MAX_WINDOWS and windows_done >= MAX_WINDOWS:
        log(f"window cap {MAX_WINDOWS} reached; stopping "
            f"({windows_done} windows banked)")
        break
    if DEADLINE and time.time() > DEADLINE:
        log(f"deadline reached before window {wi+1}/{W}; stopping "
            f"({windows_done} windows banked)")
        break
    st = time.time()
    pos, neg = resident.btm_resident(tel, blg, fig, m_range=(m0, m1))
    _ = float(np.asarray(pos.re.sum()))
    tb = time.time() - st
    sht.clear_legendre_cache()
    t_btm += tb
    st = time.time()
    fkw = (
        dict(band_lt=band_lt, ps_threshold=0.1) if rec["fisher"] else {}
    )
    out = resident.product_all_resident(
        tel, pos, neg, ls, lf, noisew, bucket=True, m_range=(m0, m1),
        topband=NS2_TOPBAND, kl_cut=0.1, **fkw,
    )
    if rec["fisher"]:
        ev, nmo, fish = out
        fish_total += fish  # padded m's contribute exact zeros
    else:
        ev, nmo = out
        fish = None
    # trim the static-width padding rows (m >= mmax + 1)
    ev, nmo = ev[: m_real - m0], nmo[: m_real - m0]
    tp = time.time() - st
    t_prod += tp
    del pos, neg
    evs.append(ev)
    nmods.append(nmo)
    extra_ck = {"fish": fish} if fish is not None else {}
    np.savez(ck + ".tmp.npz", ev=ev, nmo=nmo, tb=tb, tp=tp, **extra_ck)
    os.replace(ck + ".tmp.npz", ck)
    windows_done += 1
    log(f"window {wi+1}/{W} m=[{m0},{m1}): btm {tb:.1f}s product {tp:.1f}s "
        f"max_ev {float(ev.max()):.3e} retained {int((ev > 0.1).sum())}")
    if not SMOKE:
        for _try in range(3):
            r = subprocess.run(
                ["git", "-C", "/root/repo", "add", _CKPT_GIT_DIR],
                capture_output=True)
            if r.returncode == 0:
                r = subprocess.run(
                    ["git", "-C", "/root/repo", "commit", "-q",
                     "-m", f"{rec['kind']} north-star window "
                     f"{wi+1}/{W}",
                     "--", _CKPT_GIT_DIR], capture_output=True)
            if r.returncode == 0:
                break
            time.sleep(5)
        else:
            log(f"window {wi+1}: checkpoint commit failed "
                f"({r.stderr.decode()[:200]})")

rec["windows_done"] = windows_done
rec["partial"] = windows_done < W
rec["window_cap"] = MAX_WINDOWS or 0
# a deliberate NS2_MAX_WINDOWS cap is a *complete* deliverable (the
# scale axis banks its first windows by design), not a partial
_capped_done = bool(MAX_WINDOWS and windows_done >= MAX_WINDOWS)
evals = np.concatenate(evs) if evs else np.zeros((0, 1))
nmodes = np.concatenate(nmods) if nmods else np.zeros(0, int)
rec["t_btm_s"] = round(t_btm, 1)
rec["t_product_s"] = round(t_prod, 1)
if evals.size:
    rec["finite"] = bool(np.isfinite(evals).all())
    rec["max_eval"] = float(evals.max())
    rec["retained_modes"] = int((evals > 0.1).sum())
    m_done = evals.shape[0]
    rec["m_done"] = int(m_done)
    rec["rate_m_per_s"] = round(m_done / max(t_btm + t_prod, 1e-9), 3)
if fish_total is not None and windows_done:
    rec["fisher_finite"] = bool(np.isfinite(fish_total).all())
    rec["fisher_k"] = int(resident._FISHER_K[0])
    rec["fisher_diag"] = [float(x) for x in np.real(np.diag(fish_total))]
    _fish_path = "/tmp/ns2_smoke_fisher.npz" if SMOKE else _FISH_PATH
    np.savez(_fish_path, fisher=fish_total)
    log(f"fisher saved to {_fish_path}; diag head "
        f"{np.real(np.diag(fish_total))[:3]}")
log(f"TOTAL: btm {t_btm:.1f}s product {t_prod:.1f}s; windows "
    f"{windows_done}/{W}")

_rec_path = "/tmp/ns2_smoke_record.json" if SMOKE else _REC_PATH
# a partial record must not gate the chain as "done": keep a .partial
# suffix until every window is banked
if rec["partial"] and not _capped_done and not SMOKE:
    _rec_path += ".partial"
with open(_rec_path, "w") as f:
    json.dump(rec, f, indent=1)
log(f"record written to {_rec_path}")
