"""Quadratic power-spectrum estimation (Tegmark-style Fisher forecasting).

Functional parity with /root/reference/drift/core/psestimation.py: band
definitions (polar/cartesian), per-band angular power spectra, the
q-estimator, and Fisher/bias accumulation over m-modes.  The per-band
C_l arrays are built with the matmul quadrature in skymodel.Corr21cm, and
the band-covariance projections ride the jitted einsums in BeamTransfer.
"""

from __future__ import annotations

import abc
import logging
import os
import time

import h5py
import numpy as np

from .. import config
from ..ops import linalg
from ..parallel import comm
from ..util import util
from . import skymodel

logger = logging.getLogger(__name__)


def uniform_band(k, kstart, kend):
    return np.where(
        np.logical_and(k > kstart, k < kend), np.ones_like(k), np.zeros_like(k)
    )


def bandfunc_2d_polar(ks, ke, ts, te):
    def band(k, mu):
        theta = np.arccos(np.clip(mu, -1.0, 1.0))
        tb = (theta >= ts) * (theta <= te)
        kb = (k >= ks) * (k < ke)
        return (kb * tb).astype(np.float64)

    return band


def bandfunc_2d_cart(kpar_s, kpar_e, kperp_s, kperp_e):
    def band(k, mu):
        kpar = k * mu
        kperp = k * (1.0 - mu**2) ** 0.5
        parb = (kpar >= kpar_s) * (kpar <= kpar_e)
        perpb = (kperp >= kperp_s) * (kperp < kperp_e)
        return (parb * perpb).astype(np.float64)

    return band


def range_config(lst):
    """Expand a list of {spacing, start, stop, num} dicts into bin edges."""
    lst2 = []
    endpoint = False
    count = 1
    for item in lst:
        if isinstance(item, dict):
            if count == len(lst):
                endpoint = True
            count += 1

            if item["spacing"] == "log":
                item = np.logspace(
                    np.log10(item["start"]),
                    np.log10(item["stop"]),
                    item["num"],
                    endpoint=endpoint,
                )
            elif item["spacing"] == "linear":
                item = np.linspace(
                    item["start"], item["stop"], item["num"], endpoint=endpoint
                )
            lst2.append(np.atleast_1d(item))
        else:
            raise Exception("Require a dict.")

    return np.concatenate(lst2)


def decorrelate_ps(ps, fisher):
    """Decorrelate a power spectrum estimate with the Fisher Cholesky.

    Returns (decorrelated ps, errors, window functions)."""
    fh = np.linalg.cholesky(fisher)
    fhi = np.linalg.inv(fh)

    m = fhi / np.sum(fh.T, axis=1)[:, np.newaxis]
    w = np.dot(m, fisher)

    evm = np.dot(m, np.dot(fisher, m.T)).diagonal() ** 0.5
    psd = np.dot(w, ps)

    return psd, evm, w


def decorrelate_ps_file(fname):
    with h5py.File(fname, "r") as f1:
        return decorrelate_ps(f1["powerspectrum"][:], f1["fisher"][:])


class PSEstimation(config.Reader, metaclass=abc.ABCMeta):
    """Base class for quadratic power spectrum estimation.

    Config mirrors /root/reference/drift/core/psestimation.py:146-201.
    """

    bandtype = config.Property(proptype=str, default="polar")

    k_bands = config.Property(
        proptype=range_config,
        default=lambda: np.linspace(0.0, 0.4, 20, endpoint=True),
    )
    num_theta = config.Property(proptype=int, default=1)

    kpar_bands = config.Property(
        proptype=range_config,
        default=lambda: np.linspace(0.0, 0.4, 20, endpoint=True),
    )
    kperp_bands = config.Property(
        proptype=range_config,
        default=lambda: np.linspace(0.0, 0.4, 20, endpoint=True),
    )

    threshold = config.Property(proptype=float, default=0.0)

    unit_bands = config.Property(proptype=bool, default=True)

    zero_mean = config.Property(proptype=bool, default=True)

    crosspower = False

    clarray = None

    fisher = None
    bias = None

    def __init__(self, kltrans, subdir="ps"):
        self.kltrans = kltrans
        self.telescope = kltrans.telescope
        self.psdir = self.kltrans.evdir + "/" + subdir + "/"

        if comm.rank0() and not os.path.exists(self.psdir):
            os.makedirs(self.psdir)
        comm.barrier()

    def __getstate__(self):
        # Band window functions are closures (unpicklable) and the band
        # C_l arrays are bulky: drop them; genbands() rebuilds on demand.
        state = self.__dict__.copy()
        for key in ("band_func", "band_pk", "clarray", "_bp_cache"):
            state.pop(key, None)
        return state

    @property
    def nbands(self):
        return self.k_center.size

    def num_evals(self, mi):
        evals = self.kltrans.modes_m(mi, threshold=self.threshold)[0]
        return evals.size if evals is not None else 0

    # ============ band construction ============

    def genbands(self):
        """Precompute the P(k, mu) bands and their angular power spectra."""
        logger.info("Generating bands...")

        cr = skymodel.Corr21cm()
        cr.ps_2d = False

        if self.bandtype == "polar":
            self.theta_bands = np.linspace(
                0.0, np.pi / 2.0, self.num_theta + 1, endpoint=True
            )
            kb, tb = np.broadcast_arrays(
                self.k_bands[np.newaxis, :], self.theta_bands[:, np.newaxis]
            )

            self.k_start = kb[1:, :-1].flatten()
            self.k_end = kb[1:, 1:].flatten()
            self.k_center = 0.5 * (self.k_end + self.k_start)

            self.theta_start = tb[:-1, 1:].flatten()
            self.theta_end = tb[1:, 1:].flatten()
            self.theta_center = 0.5 * (self.theta_end + self.theta_start)

            bounds = list(
                zip(self.k_start, self.k_end, self.theta_start, self.theta_end)
            )
            self.band_func = [bandfunc_2d_polar(*bound) for bound in bounds]

        elif self.bandtype == "cartesian":
            kparb, kperpb = np.broadcast_arrays(
                self.kpar_bands[np.newaxis, :], self.kperp_bands[:, np.newaxis]
            )

            self.kpar_start = kparb[1:, :-1].flatten()
            self.kpar_end = kparb[1:, 1:].flatten()
            self.kpar_center = 0.5 * (self.kpar_end + self.kpar_start)

            self.kperp_start = kperpb[:-1, 1:].flatten()
            self.kperp_end = kperpb[1:, 1:].flatten()
            self.kperp_center = 0.5 * (self.kperp_end + self.kperp_start)

            bounds = list(
                zip(self.kpar_start, self.kpar_end, self.kperp_start, self.kperp_end)
            )
            self.k_center = (self.kpar_center**2 + self.kperp_center**2) ** 0.5
            self.band_func = [bandfunc_2d_cart(*bound) for bound in bounds]

        else:
            raise Exception(f"Bandtype {self.bandtype} is not supported.")

        if self.unit_bands:
            # Bands are sections of the fiducial spectrum (fiducial
            # amplitude of each band is 1).
            self.band_pk = [
                (lambda bandt: (lambda k, mu: cr.ps_vv(k) * bandt(k, mu)))(band)
                for band in self.band_func
            ]
            self.band_power = np.ones_like(self.k_center)
        else:
            self.band_pk = self.band_func
            self.band_power = cr.ps_vv(self.k_center)

        if self.clarray is None:
            self.make_clzz_array()

        logger.info("Done.")

    def make_clzz(self, pk):
        """Angular power spectrum of one band's P(k, mu)."""
        crt = skymodel.Corr21cm(ps=pk, redshift=1.5)
        crt.ps_2d = True

        clzz = skymodel.im21cm_model(
            self.telescope.lmax,
            self.telescope.frequencies,
            self.telescope.num_pol_sky,
            cr=crt,
            temponly=True,
        )
        logger.info("Rank: %i - Finished making band.", comm.rank())
        return clzz

    def make_clzz_array(self):
        """Build the (nbands, lmax+1, nfreq, nfreq) band C_l array."""
        self.clarray = np.zeros(
            (
                self.nbands,
                self.telescope.lmax + 1,
                self.telescope.nfreq,
                self.telescope.nfreq,
            ),
            dtype=np.float64,
        )

        p, s, e = comm.split_local(self.nbands)
        for bi in range(s, e):
            self.clarray[bi] = self.make_clzz(self.band_pk[bi])

        self.clarray = comm.allreduce(self.clarray)

    def delbands(self):
        """Drop the cached band C_l arrays to free memory."""
        self.clarray = None

    # ============ Fisher accumulation ============

    def fisher_bias_m(self, mi):
        """Fisher matrix and bias for one m."""
        if self.num_evals(mi) > 0:
            logger.info("Making fisher (for m=%i).", mi)
            fisher, bias = self._work_fisher_bias_m(mi)
        else:
            logger.info("No evals (for m=%i), skipping.", mi)
            fisher = np.zeros((self.nbands, self.nbands), dtype=np.complex128)
            bias = np.zeros((self.nbands,), dtype=np.complex128)
        return fisher, bias

    @abc.abstractmethod
    def _work_fisher_bias_m(self, mi):
        """Per-m Fisher/bias worker (implemented by subclasses)."""

    def generate(self, regen=False):
        """Accumulate the total Fisher matrix and bias, and save."""
        st = time.time()
        if comm.rank0():
            logger.info("======== Starting PS calculation ========")

        ffile = self.psdir + "/fisher.hdf5"
        if os.path.exists(ffile) and not regen:
            logger.info("Fisher matrix file: %s exists. Skipping...", ffile)
            return

        comm.barrier()

        self.genbands()

        zlist = list(enumerate(range(self.telescope.mmax + 1)))
        llist = comm.partition_list_mpi(zlist)
        fisher_bias_list = [self.fisher_bias_m(item) for ind, item in llist]

        if fisher_bias_list:
            fisher_loc, bias_loc = zip(*fisher_bias_list)
            fisher_loc = np.sum(np.array(fisher_loc), axis=0).real
            bias_loc = np.sum(np.array(bias_loc), axis=0).real
        else:
            fisher_loc = np.zeros((self.nbands, self.nbands))
            bias_loc = np.zeros((self.nbands,))

        self.fisher = comm.allreduce(fisher_loc)
        self.bias = comm.allreduce(bias_loc)

        if comm.rank0():
            logger.info(
                "======== Ending PS calculation (time=%f) ========",
                time.time() - st,
            )

            if not (self.fisher == 0).all():
                cv = linalg.pinv(self.fisher, rcond=1e-8)
                err = cv.diagonal() ** 0.5
                cr = cv / np.outer(err, err)
            else:
                cv = np.zeros_like(self.fisher)
                err = cv.diagonal()
                cr = np.zeros_like(self.fisher)

            with h5py.File(self.psdir + "/fisher.hdf5", "w") as f:
                f.attrs["bandtype"] = np.bytes_(self.bandtype)

                f.create_dataset("fisher", data=self.fisher)
                f.create_dataset("bias", data=self.bias)
                f.create_dataset("covariance", data=cv)
                f.create_dataset("errors", data=err)
                f.create_dataset("correlation", data=cr)
                f.create_dataset("band_power", data=self.band_power)

                if self.bandtype == "polar":
                    f.create_dataset("k_start", data=self.k_start)
                    f.create_dataset("k_end", data=self.k_end)
                    f.create_dataset("k_center", data=self.k_center)
                    f.create_dataset("theta_start", data=self.theta_start)
                    f.create_dataset("theta_end", data=self.theta_end)
                    f.create_dataset("theta_center", data=self.theta_center)
                    f.create_dataset("k_bands", data=self.k_bands)
                    f.create_dataset("theta_bands", data=self.theta_bands)
                elif self.bandtype == "cartesian":
                    f.create_dataset("kpar_start", data=self.kpar_start)
                    f.create_dataset("kpar_end", data=self.kpar_end)
                    f.create_dataset("kpar_center", data=self.kpar_center)
                    f.create_dataset("kperp_start", data=self.kperp_start)
                    f.create_dataset("kperp_end", data=self.kperp_end)
                    f.create_dataset("kperp_center", data=self.kperp_center)
                    f.create_dataset("kpar_bands", data=self.kpar_bands)
                    f.create_dataset("kperp_bands", data=self.kperp_bands)
        comm.barrier()

    def fisher_file(self):
        """h5py handle of the Fisher file."""
        return h5py.File(self.psdir + "fisher.hdf5", "r")

    def fisher_bias(self):
        with h5py.File(self.psdir + "/fisher.hdf5", "r") as f:
            return f["fisher"][:], f["bias"][:]

    # ============ the q estimator ============

    def q_estimator(self, mi, vec1, vec2=None, noise=False):
        """Estimate per-band q parameters from KL-basis data vectors.

        Parity with /root/reference/drift/core/psestimation.py:582-652.
        """
        evals, evecs = self.kltrans.modes_m(mi)

        if evals is None:
            return np.zeros((self.nbands + 1 if noise else self.nbands,) + vec1.shape[1:])

        # Weight by total covariance C^-1 = 1/(evals + 1)
        x0 = (vec1.T / (evals + 1.0)).T
        # Project back into the SVD basis
        x1 = np.dot(evecs.T.conj(), x0)
        # And into the sky
        x2 = self.kltrans.beamtransfer.project_vector_svd_to_sky(mi, x1, conj=True)

        if vec2 is not None:
            y0 = (vec2.T / (evals + 1.0)).T
            y1 = np.dot(evecs.T.conj(), y0)
            y2 = self.kltrans.beamtransfer.project_vector_svd_to_sky(mi, y1, conj=True)
        else:
            y0 = x0
            y2 = x2

        qa = np.zeros((self.nbands + 1 if noise else self.nbands,) + vec1.shape[1:])

        lside = self.telescope.lmax + 1

        # q_a = sum_{l,f,g} y*[f,l] C^a_l[f,g] x[g,l]  (TT only)
        xv = x2[:, 0, :]  # (nfreq, lside, ...)
        yv = y2[:, 0, :]
        for bi in range(self.nbands):
            cl = self.clarray[bi].astype(np.complex128)  # (lside, nfreq, nfreq)
            cx = np.einsum("lfg,gl...->fl...", cl, xv)
            qa[bi] = np.sum((yv.conj() * cx).real, axis=(0, 1))

        if noise:
            noisemodes = 0.0 if self.crosspower else 1.0
            noisemodes = noisemodes + (evals if self.zero_mean else 0.0)
            qa[-1] = np.sum((x0 * y0.conj()).T.real * noisemodes, axis=-1)

        return qa.real if np.iscomplexobj(qa) else qa


class PSExact(PSEstimation):
    """Exact Fisher calculation by forward-projecting band covariances."""

    @property
    def _cfile(self):
        return (
            self.psdir
            + "/ps_c_m_"
            + util.intpattern(self.telescope.mmax)
            + "_b_"
            + util.natpattern(self.nbands - 1)
            + ".hdf5"
        )

    def makeproj(self, mi, bi):
        """Project one band's angular power spectrum into the KL basis."""
        clarray = self.clarray[bi].reshape((1, 1) + self.clarray[bi].shape)
        svdmat = self.kltrans.beamtransfer.project_matrix_sky_to_svd(
            mi, clarray, temponly=True
        )
        return self.kltrans.project_matrix_svd_to_kl(mi, svdmat, self.threshold)

    def cacheproj(self, mi):
        """Cache the band projections (memory for small, disk for large)."""
        self._bp_cache = []
        use_disk = self.num_evals(mi) >= 500
        for i in range(len(self.clarray)):
            logger.info("Generating cache for m=%i band=%i", mi, i)
            projm = self.makeproj(mi, i)
            if use_disk:
                logger.info("Creating cache file: %s", self._cfile % (mi, i))
                with h5py.File(self._cfile % (mi, i), "w") as f:
                    f.create_dataset("proj", data=projm)
            else:
                self._bp_cache.append(projm)

    def delproj(self, mi):
        self._bp_cache = []
        for i in range(len(self.clarray)):
            fn = self._cfile % (mi, i)
            if os.path.exists(fn):
                os.remove(fn)

    def getproj(self, mi, bi):
        if self.num_evals(mi) < 500:
            return self._bp_cache[bi]
        with h5py.File(self._cfile % (mi, bi), "r") as f:
            return f["proj"][:]

    def _work_fisher_bias_m(self, mi):
        """Exact per-m Fisher: F_ab = Tr[C^-1 C_a C^-1 C_b] / 2-ish
        via the weighted elementwise sums of the reference."""
        evals = self.kltrans.evals_m(mi, self.threshold)

        fisher = np.zeros((self.nbands, self.nbands), dtype=np.complex128)
        bias = np.zeros(self.nbands, dtype=np.complex128)

        self.cacheproj(mi)

        ci = 1.0 / (evals + 1.0) ** 0.5
        ci = np.outer(ci, ci)

        for ia in range(self.nbands):
            c_a = self.getproj(mi, ia)
            fisher[ia, ia] = np.sum(c_a * c_a.T * ci**2)
            for ib in range(ia):
                c_b = self.getproj(mi, ib)
                fisher[ia, ib] = np.sum(c_a * c_b.T * ci**2)
                fisher[ib, ia] = np.conj(fisher[ia, ib])

        self.delproj(mi)

        return fisher, bias
