"""Monte-Carlo estimation of the Fisher matrix.

Functional parity with /root/reference/drift/core/psmc.py: use the fact
that Cov(q_a, q_b) = F_ab (Padmanabhan & Pen 2003; Dillon et al. 2012) to
estimate Fisher and bias by drawing Gaussian KL-space samples.
"""

from __future__ import annotations

import numpy as np

from .. import config
from ..parallel import comm
from . import psestimation


def complex_std_normal(shape, rng=None):
    """Complex standard normal samples (unit total variance per element)."""
    rng = rng or np.random.default_rng()
    return (
        rng.standard_normal(shape) + 1.0j * rng.standard_normal(shape)
    ) / 2**0.5


def matrix_root_manynull(mat, truncate=False):
    """Square root of a PSD matrix with (many) null directions."""
    evals, evecs = np.linalg.eigh(mat)
    evals = np.where(evals > 0.0, evals, 0.0)
    root = evecs * evals**0.5
    if truncate:
        nz = np.nonzero(evals > 0)[0]
        root = root[:, nz]
    return root


def _chunk_sizes(total, chunk=1000):
    """Sample-count chunks bounding the per-pass working set."""
    full, rem = divmod(total, chunk)
    return [chunk] * full + ([rem] if rem else [])


class MonteCarloMixin:
    """Shared sampling machinery for the Monte-Carlo PS estimators."""

    nsamples = config.Property(proptype=int, default=500)
    seed = config.Property(proptype=int, default=None)

    def _rng(self, mi):
        if self.seed is None:
            return np.random.default_rng()
        return np.random.default_rng(self.seed + 31 * mi + comm.rank())

    def gen_sample(self, mi, nsamples=None, noiseonly=False):
        """Draw KL-space data realisations from the eigenvalue spectrum.

        The KL basis diagonalises the data covariance to diag(evals + 1)
        (signal eigenvalue + unit noise), so a draw is white noise scaled
        by sqrt(evals + 1) per mode — sqrt(1) for noise-only draws.
        """
        nsamples = self.nsamples if nsamples is None else nsamples

        evals, _ = self.kltrans.modes_m(mi)
        x = complex_std_normal((evals.shape[0], nsamples), rng=self._rng(mi))
        if noiseonly:
            return x
        return x * np.sqrt(evals + 1.0)[:, np.newaxis]


class PSMonteCarlo(MonteCarloMixin, psestimation.PSEstimation):
    """Fisher via the sample covariance of the q estimator.

    Attributes
    ----------
    nsamples : int
        Number of Gaussian samples to draw per m.
    """

    def _work_fisher_bias_m(self, mi):
        """Fisher = Cov(q); bias = mean(q)."""
        qs = [
            self.q_estimator(mi, self.gen_sample(mi, n))
            for n in _chunk_sizes(self.nsamples)
        ]
        qa = np.concatenate(qs, axis=1)
        return np.cov(qa), qa.mean(axis=1)


class PSMonteCarloAlt(MonteCarloMixin, psestimation.PSEstimation):
    """Stochastic-trace-style estimation with cached per-band vectors.

    Parity with /root/reference/drift/core/psmc.py:92-199.
    """

    nswitch = config.Property(proptype=int, default=0)

    def gen_vecs(self, mi):
        """Cache Z2 sample vectors pushed through each band covariance.

        One batch of Z2 vectors is whitened by (evals+1)^-1/2, projected
        KL -> SVD -> sky, multiplied by every band's C_l (a single einsum
        over the stacked band array, TT only), and projected back — the
        cache entry for band b is then C^-1/2-weighted on both sides.
        """
        bt = self.kltrans.beamtransfer
        evals, evecs = self.kltrans.modes_m(mi)

        cf = (evals + 1.0) ** -0.5
        z2 = self._rng(mi).integers(0, 2, (evals.size, self.nsamples))
        xv = (2.0 * z2 - 1.0) * cf[:, np.newaxis]

        # eigenbasis -> SVD -> sky (temperature rows only)
        sky = bt.project_vector_svd_to_sky(
            mi,
            (evecs.T.conj() @ xv).reshape(bt.ndof(mi), self.nsamples),
            conj=True,
            temponly=True,
        )

        # All bands at once over the frequency axis (TT only):
        # banded[b, f, l, s] = sum_g C_l^b(f, g) sky[g, 0, l, s]
        clband = np.asarray(self.clarray)  # (nbands, nl, F, F)
        banded = np.einsum("blfg,gls->bfls", clband, sky[:, 0])

        self.vec_cache = []
        for bi in range(self.nbands):
            skyb = np.zeros_like(sky)
            skyb[:, 0] = banded[bi]
            svd = bt.project_vector_sky_to_svd(mi, skyb, temponly=True)
            back = evecs @ svd.reshape(bt.ndof(mi), self.nsamples)
            self.vec_cache.append(cf[:, np.newaxis] * back)

    def _work_fisher_bias_m(self, mi):
        """Fisher from pairwise inner products of the cached band vectors."""
        self.gen_vecs(mi)

        # V: (nbands, nmodes * nsamples) — Fisher is the Gram matrix / ns
        V = np.stack([v.ravel() for v in self.vec_cache])
        fisher = (V @ V.conj().T) / self.nsamples
        bias = np.zeros(self.nbands, dtype=np.complex128)
        return fisher.astype(np.complex128), bias


def sim_skyvec(trans, n):
    """Simulate alm(nu) draws given per-l covariance roots."""
    gaussvars = complex_std_normal(trans.shape[:2] + (n,))
    return np.einsum("lfg,lgn->lfn", trans, gaussvars)


def block_root(clzz):
    """Square roots of each l-block of an angular power spectrum."""
    return np.stack([matrix_root_manynull(b) for b in np.asarray(clzz)])
