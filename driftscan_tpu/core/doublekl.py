"""Two-stage KL: foreground rejection, then signal/noise diagonalisation.

Functional parity with /root/reference/drift/core/doublekl.py.
"""

from __future__ import annotations

import logging
import os

import h5py
import numpy as np

from .. import config
from ..ops import linalg
from ..parallel import comm
from . import kltransform

logger = logging.getLogger(__name__)


class DoubleKL(kltransform.KLTransform):
    """KL with an initial S/F (foreground) filtering step.

    Attributes
    ----------
    foreground_threshold : scalar
        S/F power ratio below which modes are discarded as
        foreground-contaminated (step 1 cut).
    """

    foreground_threshold = config.Property(proptype=float, default=100.0)

    def _transform_m(self, mi):
        inv = None
        nside = self.beamtransfer.ndof(mi)

        if nside == 0:
            return (
                np.array([]),
                np.array([[]]),
                np.array([[]]),
                {"ac": 0.0, "f_evals": np.array([])},
            )

        # Step 1: signal/foreground eigenproblem (thermal noise off).
        self.use_thermal = False
        cs, cn = [cv.reshape(nside, nside) for cv in self.sn_covariance(mi)]

        evals, evecs2, ac = kltransform.eigh_gen(
            cs, cn, message=f"m = {mi}; KL step 1"
        )
        evecs = evecs2.T.conj()

        ind = np.where(evals > self.foreground_threshold)

        evextra = {"ac": ac, "f_evals": evals.copy()}

        if self.inverse:
            inv = linalg.inv_gen(evecs).T

        evals = evals[ind]
        evecs = evecs[ind]
        inv = inv[ind] if self.inverse else None

        if evals.size > 0:
            # Step 2: full S/N eigenproblem in the foreground-cleaned basis.
            self.use_thermal = True
            cs, cn = [cv.reshape(nside, nside) for cv in self.sn_covariance(mi)]
            cs = np.dot(evecs, np.dot(cs, evecs.T.conj()))
            cn = np.dot(evecs, np.dot(cn, evecs.T.conj()))

            evals, evecs2, ac = kltransform.eigh_gen(
                cs, cn, message=f"m = {mi}; KL step 2"
            )
            evecs = np.dot(evecs2.T.conj(), evecs)

            if self.inverse:
                inv2 = linalg.inv_gen(evecs2)
                inv = np.dot(inv2, inv)

        return evals, evecs, inv, evextra

    def _ev_save_hook(self, f, evextra):
        kltransform.KLTransform._ev_save_hook(self, f, evextra)
        f.create_dataset("f_evals", data=evextra["f_evals"])

    def _collect(self):
        shape = (2, self.beamtransfer.ndofmax)

        def evfunc(mi):
            ta = np.zeros(shape, dtype=np.float64)
            with h5py.File(self._evfile % mi, "r") as f:
                if f["evals_full"].shape[0] > 0:
                    ev = f["evals_full"][:]
                    fev = f["f_evals"][:]
                    ta[0, -ev.size :] = ev
                    ta[1, -fev.size :] = fev
            return ta

        if comm.rank0():
            logger.info("Creating eigenvalues file (process 0 only).")

        mlist = list(range(self.telescope.mmax + 1))
        evarray = kltransform.collect_m_array(mlist, evfunc, shape, np.float64)

        if comm.rank0():
            fname = self.evdir + "/evals.hdf5"
            if os.path.exists(fname):
                logger.info("File %s exists. Skipping...", fname)
                return
            with h5py.File(fname, "w") as f:
                f.create_dataset("evals", data=evarray[:, 0])
                f.create_dataset("f_evals", data=evarray[:, 1])
