"""Device-resident product generation: BTM -> SVD -> KL without host trips.

The file-based pipeline stages communicate through HDF5 (the reference's
contract), which forces a device->host fetch of the full BTM and a
host->device re-upload for the SVD/KL stage.  On a remote-attached TPU
the link is orders of magnitude slower than HBM, so for in-memory
workflows (benchmarking, interactive analysis, simulation) this module
keeps everything resident:

* :func:`btm_resident` computes the beam transfer matrices bucket-by-
  bucket (per-nside, like ``TransitTelescope.transfer_matrices``) and
  leaves the (l, m) tables on device, padded to the global band limit;
* :func:`product_step_resident` builds each m-batch's beam matrix on
  device (a gather along the m axis + the (-1)^m conjugate negative-m
  block, reference packing at
  /root/reference/drift/core/beamtransfer.py:620-624) fused into the same
  jit as the SVD+KL product step, so the only host traffic is the final
  eigenvalues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import telescope as teles
from ..ops import sht, zarray as za
from . import mstep


def btm_resident(tel, bl_indices, f_indices):
    """Compute BTMs for the given units, leaving them on device.

    Returns (pos, neg): Z pytrees with planes
    ``pos (nu, npol, lside+1, lside+1)`` (coefficients for m >= 0) and
    ``neg (nu, npol, lside+1, lside)`` (m = -1 ... -lside), already
    masked to each unit's own band limit.  For unpolarised telescopes
    npol == 1; polarised ones carry their transformed Stokes components
    (the skipped ones stay zero, matching ``transfer_matrices``).
    """
    bl_indices = np.asarray(bl_indices)
    f_indices = np.asarray(f_indices)
    lside = tel.lmax
    npol = tel.num_pol_sky

    lmax_arr, _ = teles.max_lm(
        tel.baselines[bl_indices],
        tel.wavelengths[f_indices],
        tel.u_width,
        tel.v_width,
    )
    lmax_arr = np.ceil(lmax_arr * tel.l_boost).astype(np.int64)
    nsides = np.array([tel._nside_for(int(l)) for l in lmax_arr])

    nu = len(bl_indices)
    dt = jnp.float32 if tel.single_precision else jnp.float64
    pos_re = jnp.zeros((nu, npol, lside + 1, lside + 1), dtype=dt)
    pos_im = jnp.zeros_like(pos_re)
    neg_re = jnp.zeros((nu, npol, lside + 1, lside), dtype=dt)
    neg_im = jnp.zeros_like(neg_re)

    for ns in np.unique(nsides):
        bucket = np.nonzero(nsides == ns)[0]
        boff = 0
        for take in teles.sht_unit_chunks(len(bucket), 12 * int(ns) ** 2, npol):
            sel = bucket[boff : boff + take]
            boff += take
            sub_lmax = int(lmax_arr[sel].max())

            # pad the unit batch to a power of two for shape-stable compiles
            nsel = len(sel)
            npad = 1 << max(nsel - 1, 0).bit_length()
            bsel = np.concatenate(
                [bl_indices[sel], np.repeat(bl_indices[sel][-1], npad - nsel)]
            )
            fsel = np.concatenate(
                [f_indices[sel], np.repeat(f_indices[sel][-1], npad - nsel)]
            )

            tel._init_trans(int(ns))
            cvis = tel._beam_map_batch_split(bsel, fsel)
            if tel.single_precision:
                cvis = za.Z(cvis.re.astype(jnp.float32), cvis.im.astype(jnp.float32))

            # btrans = conj(SHT(conj(map))) (reference telescope.py:1188-1191)
            p, n = sht.analysis_split(cvis.conj(), lmax=sub_lmax, neg_m=True)
            p, n = p.conj(), n.conj()

            # normalise to a pol axis: (nu, npol_t, l, m)
            if p.re.ndim == 3:
                p = za.Z(p.re[:, None], p.im[:, None])
                n = za.Z(n.re[:, None], n.im[:, None])
            npol_t = p.re.shape[1]

            # per-unit band-limit mask
            ls = np.arange(sub_lmax + 1)
            lmask = jnp.asarray(
                (ls[None, :] <= lmax_arr[sel, None]).astype(np.float32), dtype=dt
            )
            sub = np.s_[: sub_lmax + 1]

            pm = lmask[:, None, :, None]  # masks l; broadcasts (pol, m)
            pols = np.s_[:npol_t]
            pos_re = pos_re.at[sel, pols, sub, : sub_lmax + 1].set(p.re[:nsel] * pm)
            pos_im = pos_im.at[sel, pols, sub, : sub_lmax + 1].set(p.im[:nsel] * pm)
            neg_re = neg_re.at[sel, pols, sub, :sub_lmax].set(n.re[:nsel] * pm)
            neg_im = neg_im.at[sel, pols, sub, :sub_lmax].set(n.im[:nsel] * pm)

    return za.Z(pos_re, pos_im), za.Z(neg_re, neg_im)


@functools.partial(
    jax.jit,
    static_argnames=(
        "npairs", "nfreq", "nl", "npol", "fg_levels", "sig_levels",
        "fg_k_cap", "sig_k_cap", "band_rel", "method",
    ),
)
def _resident_batch(
    pos_re,
    pos_im,
    neg_re,
    neg_im,
    noisew,
    ls,
    lf,
    mv,
    npairs: int,
    nfreq: int,
    nl: int,
    npol: int = 1,
    fg_levels: int = 8,
    sig_levels: int = 2,
    fg_k_cap: int = 0,
    sig_k_cap: int = 0,
    band_rel: float = 3e-2,
    method: str = "qr",
):
    """Build the m-batch beam matrices on device and run the product step.

    pos/neg planes are (nu, npol, nl, nm*) with units ordered
    baseline-major (u = bl * nfreq + f).
    """

    def build_one(m):
        p_re = jnp.take(pos_re, m, axis=-1)  # (nu, npol, nl)
        p_im = jnp.take(pos_im, m, axis=-1)
        midx = jnp.maximum(m - 1, 0)
        n_re = jnp.take(neg_re, midx, axis=-1)
        n_im = jnp.take(neg_im, midx, axis=-1)
        sign = jnp.where(m % 2 == 0, 1.0, -1.0).astype(p_re.dtype)
        use_neg = (m > 0).astype(p_re.dtype)
        n_re = sign * use_neg * n_re
        n_im = -sign * use_neg * n_im  # conjugate

        def organise(x):
            # (nu, npol, nl) -> (nfreq, npairs, npol*nl)
            return x.reshape(npairs, nfreq, npol * nl).transpose(1, 0, 2)

        top_re, top_im = organise(p_re), organise(p_im)
        bot_re, bot_im = organise(n_re), organise(n_im)
        # telescope axis: positive-m pair block, then the conjugate block
        return (
            jnp.concatenate([top_re, bot_re], axis=1),
            jnp.concatenate([top_im, bot_im], axis=1),
        )

    beams_re, beams_im = jax.vmap(build_one)(mv)

    return mstep.kl_product_step_split(
        beams_re,
        beams_im,
        noisew,
        ls,
        lf,
        mv,
        npol=npol,
        nl=nl,
        fg_levels=fg_levels,
        sig_levels=sig_levels,
        fg_k_cap=fg_k_cap,
        sig_k_cap=sig_k_cap,
        band_rel=band_rel,
        method=method,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "npairs", "nfreq", "nl", "npol", "fg_levels", "sig_levels",
        "fg_k_cap", "sig_k_cap", "band_rel", "method",
    ),
)
def _spectrum_batch(
    pos_re,
    pos_im,
    neg_re,
    neg_im,
    noisew,
    ls,
    lf,
    mv,
    npairs: int,
    nfreq: int,
    nl: int,
    npol: int = 1,
    fg_levels: int = 8,
    sig_levels: int = 2,
    fg_k_cap: int = 0,
    sig_k_cap: int = 0,
    band_rel: float = 3e-2,
    method: str = "qr",
):
    """Spectrum-only product batch: returns just (evals, nmodes), so XLA
    dead-code-eliminates the eigenvector/beam outputs a spectrum pass
    never reads.

    (One jit per m-batch rather than a lax.scan over all batches: the
    fully fused whole-spectrum program crashes this TPU runtime's worker,
    and per-batch dispatch costs only ~25 ms each.)
    """
    res = _resident_batch.__wrapped__(
        pos_re,
        pos_im,
        neg_re,
        neg_im,
        noisew,
        ls,
        lf,
        mv,
        npairs=npairs,
        nfreq=nfreq,
        nl=nl,
        npol=npol,
        fg_levels=fg_levels,
        sig_levels=sig_levels,
        fg_k_cap=fg_k_cap,
        sig_k_cap=sig_k_cap,
        band_rel=band_rel,
        method=method,
    )
    return res.evals, res.nmodes


# One y-Gram deflation level resolves eigenvalues to ~n*eps(f32) of the
# top absolutely; with retained modes cut at eval ~0.1 a single level is
# accurate (rel <~ 1e-3) whenever the batch's top whitened eigenvalue
# stays below this bound — above it the batch is re-solved deeper.
_SIG1_TOP_BOUND = 1.0


def _auto_mbatch(tel, hbm_budget_gb=4.0):
    """m-batch size bounding the product step's working set.

    Dominant per-m buffers (all f32 on split backends): the interleaved
    QR augmentation (2(K+n) x 2n), the whitened factor (2n x 2K) and a
    few (2n)^2 Gram/eigh temporaries; a ~3x allowance covers XLA's
    fusion copies.  Measured: mbatch=8 at ndof=1088 exceeds HBM by
    ~0.8 GB, and this estimate picks 4 there.
    """
    nl = tel.lmax + 1
    n = tel.nfreq * min(nl, 2 * tel.npairs) * tel.num_pol_sky
    K = nl * tel.num_pol_sky * tel.nfreq
    n2, k2 = 2 * n, 2 * K
    per_m = (
        (k2 + n2) * n2  # QR augmentation
        + n2 * k2  # whitened factor planes
        + 6 * n2 * n2  # Gram + eigh workspace
    ) * 4.0 * 3.0
    budget = hbm_budget_gb * 2**30
    mb = int(max(1, min(8, budget // max(per_m, 1.0))))
    return 1 << (mb.bit_length() - 1)  # power of two


def product_all_resident(
    tel, pos, neg, ls, lf, noisew, mbatch=None, max_m=None, mesh=None,
    sig_k_cap=0, sig_levels=None,
):
    """Run the SVD+KL product step over every m from resident BTMs.

    Fetches only the eigen-spectrum: returns (evals (nm, ndof), nmodes
    (nm, nfreq)) as host numpy.

    With a multi-device ``mesh`` the m batch of each dispatch is sharded
    over the mesh axis (the BTM tables are replicated) so every chip
    solves its own m-modes — the multi-chip scaling axis of the pipeline
    (SURVEY.md section 2.3).  Scale ``mbatch`` with the device count.

    ``sig_levels=None`` selects the depth *adaptively per batch*: each
    batch is first solved with a single whitened-signal Gram level (the
    eigh is ~85% of the step cost), and only batches whose top
    eigenvalue exceeds ``_SIG1_TOP_BOUND`` — where the retained range
    outruns one level's f32 resolution — are re-solved with the deeper
    default.  The host sees every spectrum anyway, so the check is free.

    ``sig_k_cap`` rank-caps the *signal-side* Gram levels (subspace
    iteration): measured exact to ~2e-3 — within the f32 engine's own
    noise band — because the whitened signal spectrum is concentrated.
    (Capping the foreground side is NOT safe; see fpencil.gram_bands_topk.)
    """
    nm = tel.mmax + 1 if max_m is None else max_m
    nl = tel.lmax + 1
    dt = pos.re.dtype

    if mbatch is None:
        mbatch = _auto_mbatch(tel)

    noisew = jnp.asarray(np.asarray(noisew), dtype=dt)
    ls = jnp.asarray(np.asarray(ls), dtype=dt)
    lf = jnp.asarray(np.asarray(lf), dtype=dt)

    place_mv = jnp.asarray
    if mesh is not None and mesh.devices.size > 1:
        import jax.sharding as jsh

        if mbatch % mesh.devices.size:
            mbatch = ((mbatch // mesh.devices.size) + 1) * mesh.devices.size
        shard = jsh.NamedSharding(mesh, jsh.PartitionSpec(mesh.axis_names[0]))

        def place_mv(x):
            return jax.device_put(x, shard)

    adaptive = sig_levels is None

    def run(mv, levels):
        kwargs = {} if levels is None else {"sig_levels": levels}
        return _spectrum_batch(
            pos.re,
            pos.im,
            neg.re,
            neg.im,
            noisew,
            ls,
            lf,
            place_mv(mv),
            npairs=tel.npairs,
            nfreq=tel.nfreq,
            nl=nl,
            npol=tel.num_pol_sky,
            sig_k_cap=sig_k_cap,
            **kwargs,
        )

    evals, nmodes = [], []
    for s in range(0, nm, mbatch):
        ms = np.arange(s, min(s + mbatch, nm))
        mv = np.full(mbatch, -1, np.int32)
        mv[: len(ms)] = ms
        ev, nmo = run(mv, 1 if adaptive else sig_levels)
        ev = np.asarray(ev)
        if adaptive and ev.max() > _SIG1_TOP_BOUND:
            ev, nmo = run(mv, None)  # deepen: default levels
            ev = np.asarray(ev)
        evals.append(ev[: len(ms)])
        nmodes.append(np.asarray(nmo)[: len(ms)])
    return np.concatenate(evals), np.concatenate(nmodes)
