"""Cross-power spectrum estimation (two independent data streams).

Functional parity with /root/reference/drift/core/crosspower.py.
"""

from __future__ import annotations

import numpy as np

from . import psmc


class CrossPower(psmc.PSMonteCarlo):
    """Monte-Carlo Fisher for a cross-power estimator.

    Instrumental noise does not bias a cross-power, so the noise
    projection is excluded (`crosspower = True`) and each q draw uses two
    independent realisations of the data.
    """

    crosspower = True

    def _work_fisher_bias_m(self, mi):
        """Fisher and bias from the covariance of two-stream q estimates.

        The q row block is extended by the noise band (``noise=True``);
        its covariance row against the signal bands is the bias.
        """
        qs = [
            self.q_estimator(
                mi, self.gen_sample(mi, n), self.gen_sample(mi, n), noise=True
            )
            for n in psmc._chunk_sizes(self.nsamples)
        ]
        qcov = np.cov(np.concatenate(qs, axis=1))
        return qcov[: self.nbands, : self.nbands], qcov[-1, : self.nbands]
