"""The batched, mesh-sharded per-m product step.

This is the TPU performance path for the pipeline core: one jitted
program that takes a *batch of m-modes* of beam transfer matrices and
produces the SVD compression and the KL filter for every one of them —
the work the reference distributes as a per-m loop over MPI ranks
(/root/reference/drift/core/beamtransfer.py:678-929 and
/root/reference/drift/core/kltransform.py:310-355).

Shapes are fully padded (masks instead of data-dependent rank cuts), so
the batch vmaps on one chip and shards over a ``Mesh`` along the m axis
with pjit — XLA inserts any ICI collectives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import linalg


class ProductStepResult(NamedTuple):
    """Per-m outputs of the batched product step (all padded)."""

    ut: jnp.ndarray  # (M, F, S, T) telescope -> SVD basis
    beam_svd: jnp.ndarray  # (M, F, S, P*L) sky -> SVD basis
    sig: jnp.ndarray  # (M, F, S) singular values
    nmodes: jnp.ndarray  # (M, F) retained mode counts
    evals: jnp.ndarray  # (M, F*S) KL eigenvalues (ascending, 0-padded)
    evecs: jnp.ndarray  # (M, F*S, F*S) KL modes (rows)


def _project_sky_covariance(bsvd, cl):
    """S[f a, g b] = sum_{p,q,l} B[f,a,p,l] C[p,q,l,f,g] B*[g,b,q,l]."""
    F, S = bsvd.shape[0], bsvd.shape[1]
    mat = jnp.einsum("fapl,pqlfg,gbql->fagb", bsvd, cl, bsvd.conj(), optimize=True)
    return mat.reshape(F * S, F * S)


def _project_diag_noise(ut, npower):
    """Block-diagonal projection of the radiometer noise into SVD basis."""
    F, S = ut.shape[0], ut.shape[1]
    blocks = jnp.einsum("fat,ft,fbt->fab", ut, npower, ut.conj())
    eye = jnp.eye(F, dtype=blocks.dtype)
    return (eye[:, None, :, None] * blocks[:, :, None, :]).reshape(F * S, F * S)


def kl_product_step(
    beam,
    noisew,
    cl_signal,
    cl_noise,
    npower,
    m_values,
    npol: int,
    nl: int,
    polsvcut: float = 1e-4,
    svcut: float = 1e-6,
    reg: float = 1e-14,
) -> ProductStepResult:
    """SVD-compress and KL-filter a batch of m-modes in one jitted program.

    Parameters
    ----------
    beam : (M, F, T, npol*nl) complex
        Beam transfer matrix batch (m-major).
    noisew : (F, T) float
        Inverse noise weights (noisepower^-1/2) per frequency.
    cl_signal, cl_noise : (npol, npol, nl, F, F)
        Signal and foreground sky covariances.
    npower : (F, T) float
        Diagonal instrumental noise power.
    m_values : (M,) int
        The m of each batch element; elements with m < 0 are padding and
        produce zero outputs.
    """

    dt_c = beam.dtype
    dt_r = jnp.real(beam).dtype

    noisew = noisew.astype(dt_r)
    cl_signal = cl_signal.astype(dt_r)
    cl_noise = cl_noise.astype(dt_r)
    npower = npower.astype(dt_r)

    def one_m(bm, mval):
        F = bm.shape[0]

        # The beam is only sensitive to l >= m: mask (matches the compact
        # l >= m storage of the reference).
        ls = jnp.arange(nl)
        lmask = (ls >= mval).astype(dt_r)
        bm = bm * jnp.tile(lmask, npol)[None, None, :]

        bw = bm * noisew[:, :, None].astype(dt_c)

        # --- SVD compression (batched over frequency) ---
        ut, bsvd, sig, nmodes = linalg.triple_svd_batched(
            bw, npol=npol, nl=nl, polsvcut=polsvcut
        )
        # ut currently projects *noise-weighted* telescope vectors; keep
        # that convention inside this step (the covariances below are
        # projected consistently).

        S = ut.shape[1]

        # Apply the global svcut (relative to the max singular value of
        # this m) by masking modes below it.
        sigmax = sig.max()
        svmask = (sig > sigmax * svcut).astype(dt_r)  # (F, S)
        ut = ut * svmask[:, :, None].astype(dt_c)
        bsvd = bsvd * svmask[:, :, None].astype(dt_c)

        # --- covariance projections ---
        bsvd_r = bsvd.reshape(F, S, npol, nl)
        s_mat = _project_sky_covariance(bsvd_r, cl_signal)
        n_mat = _project_sky_covariance(bsvd_r, cl_noise)

        # Foreground regulariser (reference kltransform.py:288-290)
        nmax = jnp.abs(n_mat).max()
        n_mat = n_mat + reg * nmax * jnp.eye(n_mat.shape[0], dtype=dt_c)

        # Instrumental noise: ut is noise-weighted, so the projected noise
        # is ut (npower * noisew^2) ut^H; with noisew = npower^-1/2 this is
        # ut ut^H contributions — compute it explicitly for generality.
        weighted_power = npower * noisew**2
        n_mat = n_mat + _project_diag_noise(ut, weighted_power)

        # Pad the invalid directions of N with identity so the whitening
        # is well posed; S is exactly zero there so their KL evals are 0.
        valid = svmask.reshape(-1)
        n_mat = n_mat + jnp.diag((1.0 - valid).astype(dt_c))

        # --- whitened generalised eigenproblem ---
        L = jnp.linalg.cholesky(n_mat)
        Li_S = jax.scipy.linalg.solve_triangular(L, s_mat, lower=True)
        C = (
            jax.scipy.linalg.solve_triangular(L, Li_S.conj().T, lower=True)
            .conj()
            .T
        )
        C = 0.5 * (C + C.conj().T)
        evals, u = jnp.linalg.eigh(C)
        evecs = jax.scipy.linalg.solve_triangular(L.conj().T, u, lower=False)
        evecs = evecs.conj().T  # rows are KL modes

        # Zero padding elements of the batch
        is_pad = mval < 0
        zero_c = jnp.zeros((), dtype=dt_c)
        return (
            jnp.where(is_pad, zero_c, 1.0) * ut,
            jnp.where(is_pad, zero_c, 1.0) * bsvd,
            jnp.where(is_pad, 0.0, 1.0) * sig,
            jnp.where(is_pad, 0, 1) * nmodes,
            jnp.where(is_pad, 0.0, 1.0) * evals,
            jnp.where(is_pad, zero_c, 1.0) * evecs,
        )

    out = jax.vmap(one_m)(beam, m_values)
    return ProductStepResult(*out)


class ProductStepResultSplit(NamedTuple):
    """Split-complex per-m outputs (re/im planes)."""

    ut_re: jnp.ndarray
    ut_im: jnp.ndarray
    beam_re: jnp.ndarray
    beam_im: jnp.ndarray
    sig: jnp.ndarray
    nmodes: jnp.ndarray
    evals: jnp.ndarray
    evecs_re: jnp.ndarray
    evecs_im: jnp.ndarray


def kl_product_step_split(
    beam_re,
    beam_im,
    noisew,
    cl_signal,
    cl_noise,
    npower,
    m_values,
    npol: int,
    nl: int,
    polsvcut: float = 1e-4,
    svcut: float = 1e-6,
    reg: float = 1e-14,
) -> ProductStepResultSplit:
    """Split-complex version of :func:`kl_product_step` (complex-free TPUs).

    Same math with (re, im) planes: complex contractions via real MXU
    einsums, SVDs via Gram eigendecompositions, the generalised
    eigenproblem via the eigh-whitening of ops.zarray.whiten_eigh.
    """
    from ..ops import zarray as za

    dt_r = beam_re.dtype
    noisew = noisew.astype(dt_r)
    cl_signal = cl_signal.astype(dt_r)
    cl_noise = cl_noise.astype(dt_r)
    npower = npower.astype(dt_r)

    def proj_cov(bsvd: "za.Z", cl):
        # T1[q, l, f, g, a] = sum_p B[f,a,p,l] C[p,q,l,f,g] (C real)
        F, S = bsvd.re.shape[0], bsvd.re.shape[1]
        b4_re = bsvd.re.reshape(F, S, npol, nl)
        b4_im = bsvd.im.reshape(F, S, npol, nl)
        t_re = jnp.einsum("fapl,pqlfg->faqlg", b4_re, cl, optimize=True)
        t_im = jnp.einsum("fapl,pqlfg->faqlg", b4_im, cl, optimize=True)
        t1 = za.Z(t_re, t_im)
        bc = za.Z(b4_re, -b4_im)
        mat = za.einsum("faqlg,gbql->fagb", t1, bc, optimize=True)
        return mat.reshape(F * S, F * S)

    def one_m(bm_re, bm_im, mval):
        F = bm_re.shape[0]

        ls = jnp.arange(nl)
        lmask = (ls >= mval).astype(dt_r)
        tile = jnp.tile(lmask, npol)[None, None, :]
        bm_re = bm_re * tile
        bm_im = bm_im * tile

        bw_re = bm_re * noisew[:, :, None]
        bw_im = bm_im * noisew[:, :, None]

        ut_re, ut_im, bs_re, bs_im, sig, nmodes = linalg.triple_svd_split_batched(
            bw_re, bw_im, npol=npol, nl=nl, polsvcut=polsvcut
        )

        S = ut_re.shape[1]

        sigmax = sig.max()
        svmask = (sig > sigmax * svcut).astype(dt_r)
        ut = za.Z(ut_re * svmask[:, :, None], ut_im * svmask[:, :, None])
        bsvd = za.Z(bs_re * svmask[:, :, None], bs_im * svmask[:, :, None])

        s_mat = proj_cov(bsvd, cl_signal)
        n_mat = proj_cov(bsvd, cl_noise)

        nmax = jnp.maximum(jnp.abs(n_mat.re).max(), jnp.abs(n_mat.im).max())
        eye = jnp.eye(n_mat.re.shape[0], dtype=dt_r)
        n_mat = za.Z(n_mat.re + reg * nmax * eye, n_mat.im)

        weighted_power = npower * noisew**2
        # Block-diagonal noise projection: blocks[f,a,b] = U d U^H
        xw = za.Z(ut.re * weighted_power[:, None, :], ut.im * weighted_power[:, None, :])
        blocks = za.einsum("fat,fbt->fab", xw, ut.conj())
        eyeF = jnp.eye(F, dtype=dt_r)
        nb_re = (eyeF[:, None, :, None] * blocks.re[:, :, None, :]).reshape(
            F * S, F * S
        )
        nb_im = (eyeF[:, None, :, None] * blocks.im[:, :, None, :]).reshape(
            F * S, F * S
        )
        n_mat = za.Z(n_mat.re + nb_re, n_mat.im + nb_im)

        valid = svmask.reshape(-1)
        n_mat = za.Z(n_mat.re + jnp.diag(1.0 - valid), n_mat.im)

        evals, evecs, _ = za.whiten_eigh(s_mat, n_mat)
        evecs = evecs.conj().transpose(1, 0)  # rows are KL modes

        is_pad = (mval < 0).astype(dt_r)
        keep = 1.0 - is_pad
        return (
            ut.re * keep,
            ut.im * keep,
            bsvd.re * keep,
            bsvd.im * keep,
            sig * keep,
            (nmodes * (1 - (mval < 0))).astype(jnp.int32),
            evals * keep,
            evecs.re * keep,
            evecs.im * keep,
        )

    out = jax.vmap(one_m)(beam_re, beam_im, m_values)
    return ProductStepResultSplit(*out)


def jit_product_step_split(
    npol: int,
    nl: int,
    polsvcut: float = 1e-4,
    svcut: float = 1e-6,
    reg: float = 1e-14,
    mesh=None,
):
    """jit (and optionally mesh-shard over m) the split product step."""
    fn = functools.partial(
        kl_product_step_split,
        npol=npol,
        nl=nl,
        polsvcut=polsvcut,
        svcut=svcut,
        reg=reg,
    )

    if mesh is None:
        return jax.jit(fn)

    ax = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(ax))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        fn,
        in_shardings=(shard, shard, repl, repl, repl, repl, shard),
        out_shardings=ProductStepResultSplit(*([shard] * 9)),
    )


def jit_product_step(
    npol: int,
    nl: int,
    polsvcut: float = 1e-4,
    svcut: float = 1e-6,
    reg: float = 1e-14,
    mesh=None,
):
    """jit (and optionally mesh-shard over m) the product step.

    With a mesh, the beam batch and all outputs are sharded along the
    leading m axis; the small covariance operands are replicated.
    """
    fn = functools.partial(
        kl_product_step,
        npol=npol,
        nl=nl,
        polsvcut=polsvcut,
        svcut=svcut,
        reg=reg,
    )

    if mesh is None:
        return jax.jit(fn)

    ax = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(ax))
    repl = NamedSharding(mesh, P())

    return jax.jit(
        fn,
        in_shardings=(shard, repl, repl, repl, repl, shard),
        out_shardings=ProductStepResult(
            ut=shard, beam_svd=shard, sig=shard, nmodes=shard, evals=shard, evecs=shard
        ),
    )


def btm_forward_step(alm, beam):
    """The m-mode forward model: sky alm -> visibilities for a batch of m.

    v[m, f, t] = sum_s beam[m, f, t, s] alm[m, f, s]

    This is the inner projection of timestream simulation
    (/root/reference/drift/pipeline/timestream.py:741-742), batched.
    """
    return jnp.einsum("mfts,mfs->mft", beam, alm)
