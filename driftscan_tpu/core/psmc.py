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


class PSMonteCarlo(psestimation.PSEstimation):
    """Fisher via the sample covariance of the q estimator.

    Attributes
    ----------
    nsamples : int
        Number of Gaussian samples to draw per m.
    """

    nsamples = config.Property(proptype=int, default=500)

    seed = config.Property(proptype=int, default=None)

    def _rng(self, mi):
        if self.seed is None:
            return np.random.default_rng()
        return np.random.default_rng(self.seed + 31 * mi + comm.rank())

    def gen_sample(self, mi, nsamples=None, noiseonly=False):
        """Draw KL-space data realisations from the eigenvalue spectrum."""
        nsamples = self.nsamples if nsamples is None else nsamples

        evals, evecs = self.kltrans.modes_m(mi)
        w = np.ones_like(evals) if noiseonly else (evals + 1.0) ** 0.5
        x = complex_std_normal((evals.shape[0], nsamples), rng=self._rng(mi))
        return x * w[:, np.newaxis]

    def _work_fisher_bias_m(self, mi):
        """Fisher = Cov(q); bias = mean(q)."""
        qa = np.zeros((self.nbands, self.nsamples))

        num, starts, ends = comm.split_m(
            self.nsamples, (self.nsamples // 1000) + 1
        )
        for n, s, e in zip(num, starts, ends):
            x = self.gen_sample(mi, n)
            qa[:, s:e] = self.q_estimator(mi, x)

        fisher = np.cov(qa)
        bias = qa.mean(axis=1)
        return fisher, bias


class PSMonteCarloAlt(psestimation.PSEstimation):
    """Stochastic-trace-style estimation with cached per-band vectors.

    Parity with /root/reference/drift/core/psmc.py:92-199.
    """

    nsamples = config.Property(proptype=int, default=500)
    nswitch = config.Property(proptype=int, default=0)
    seed = config.Property(proptype=int, default=None)

    def _rng(self, mi):
        if self.seed is None:
            return np.random.default_rng()
        return np.random.default_rng(self.seed + 31 * mi + comm.rank())

    def gen_vecs(self, mi):
        """Cache sample vectors projected through each band covariance."""
        self.vec_cache = []

        bt = self.kltrans.beamtransfer
        evals, evecs = self.kltrans.modes_m(mi)
        nbands = self.nbands

        cf = (evals + 1.0) ** -0.5

        rng = self._rng(mi)
        xv = 2 * (rng.random((evals.size, self.nsamples)) <= 0.5).astype(
            np.float64
        ) - 1.0

        xv1 = cf[:, np.newaxis] * xv
        xv2 = np.dot(evecs.T.conj(), xv1).reshape(bt.ndof(mi), self.nsamples)
        xv3 = bt.project_vector_svd_to_sky(mi, xv2, conj=True, temponly=True)

        for bi in range(nbands):
            xv4 = np.zeros_like(xv3)
            for li in range(self.telescope.lmax + 1):
                xv4[:, 0, li, :] = np.dot(
                    self.clarray[bi][li], xv3[:, 0, li, :]
                )  # TT only

            xv5 = bt.project_vector_sky_to_svd(mi, xv4, temponly=True)
            xv6 = np.dot(evecs, xv5.reshape(bt.ndof(mi), self.nsamples))
            xv7 = cf[:, np.newaxis] * xv6

            self.vec_cache.append(xv7)

    def _work_fisher_bias_m(self, mi):
        fisher = np.zeros((self.nbands, self.nbands), dtype=np.complex128)
        bias = np.zeros(self.nbands, dtype=np.complex128)

        self.gen_vecs(mi)
        ns = self.nsamples

        for ia in range(self.nbands):
            va = self.vec_cache[ia]
            fisher[ia, ia] = np.sum(va * va.conj()) / ns
            for ib in range(ia):
                vb = self.vec_cache[ib]
                fisher[ia, ib] = np.sum(va * vb.conj()) / ns
                fisher[ib, ia] = np.conj(fisher[ia, ib])

        return fisher, bias


def sim_skyvec(trans, n):
    """Simulate alm(nu) draws given per-l covariance roots."""
    lside = trans.shape[0]
    nfreq = trans.shape[1]

    gaussvars = complex_std_normal((lside, nfreq, n))
    for i in range(lside):
        gaussvars[i] = np.dot(trans[i], gaussvars[i])
    return gaussvars


def block_root(clzz):
    """Square roots of each l-block of an angular power spectrum."""
    trans = np.zeros_like(clzz)
    for i in range(trans.shape[0]):
        trans[i] = matrix_root_manynull(clzz[i], truncate=False)
    return trans
