"""Cross-power spectrum estimation (two independent data streams).

Functional parity with /root/reference/drift/core/crosspower.py.
"""

from __future__ import annotations

import numpy as np

from ..parallel import comm
from . import psmc


class CrossPower(psmc.PSMonteCarlo):
    """Monte-Carlo Fisher for a cross-power estimator.

    Instrumental noise does not bias a cross-power, so the noise
    projection is excluded (`crosspower = True`) and two independent
    sample sets are drawn.
    """

    crosspower = True

    def _work_fisher_bias_m(self, mi):
        qa = np.zeros((self.nbands + 1, self.nsamples))

        num, starts, ends = comm.split_m(
            self.nsamples, (self.nsamples // 1000) + 1
        )
        for n, s, e in zip(num, starts, ends):
            x1 = self.gen_sample(mi, n)
            x2 = self.gen_sample(mi, n)
            qa[:, s:e] = self.q_estimator(mi, x1, x2, noise=True)

        ft = np.cov(qa)
        fisher = ft[: self.nbands, : self.nbands]
        bias = ft[-1, : self.nbands]

        return fisher, bias
