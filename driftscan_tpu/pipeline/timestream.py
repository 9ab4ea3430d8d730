"""Timestream simulation and m-mode analysis.

Functional parity with /root/reference/drift/pipeline/timestream.py: the
same directory layout (``timestream_f/<f>/timestream.hdf5``,
``mmodes/<m>/mode.hdf5`` + svd/kl files, COMPLETED_M marker) and method
surface.  FFTs ride jnp (XLA's FFT); the per-m projections are the
BeamTransfer/KL einsum paths.
"""

from __future__ import annotations

import os
import pickle

import h5py
import numpy as np

from ..core import kltransform
from ..ops import sht
from ..parallel import comm
from ..util import util


class Timestream:
    """A simulated (or real) visibility timestream and its m-mode products."""

    directory = None
    output_directory = None
    beamtransfer_dir = None

    no_m_zero = True

    def __init__(self, tsdir, prodmanager):
        """Create a Timestream rooted at `tsdir` using `prodmanager` products."""
        self.directory = os.path.abspath(tsdir)
        self.output_directory = self.directory
        self.manager = prodmanager

    # ===== products access =====

    @property
    def beamtransfer(self):
        return self.manager.beamtransfer

    @property
    def telescope(self):
        return self.beamtransfer.telescope

    # ===== frequency-ordered timestream files =====

    def _fdir(self, fi):
        pat = self.directory + "/timestream_f/" + util.natpattern(self.telescope.nfreq)
        return pat % fi

    def _ffile(self, fi):
        return self._fdir(fi) + "/timestream.hdf5"

    @property
    def ntime(self):
        with h5py.File(self._ffile(0), "r") as f:
            return int(f.attrs["ntime"])

    def timestream_f(self, fi):
        """(npairs, ntime) visibility timestream at one frequency."""
        with h5py.File(self._ffile(fi), "r") as f:
            return f["timestream"][:]

    # ===== m-mode files =====

    def _mdir(self, mi):
        pat = self.output_directory + "/mmodes/" + util.natpattern(self.telescope.mmax)
        return pat % abs(mi)

    def _mfile(self, mi):
        return self._mdir(mi) + "/mode.hdf5"

    def mmode(self, mi):
        """(nfreq, 2, npairs) m-mode of the timestream."""
        with h5py.File(self._mfile(mi), "r") as f:
            return f["mmode"][:]

    def generate_mmodes(self):
        """FFT the timestream into m-modes and store them m-ordered."""
        if os.path.exists(self.output_directory + "/mmodes/COMPLETED_M"):
            if comm.rank0():
                print("******* m-files already generated ********")
            return

        tel = self.telescope
        mmax = tel.mmax
        nfreq = tel.nfreq

        lfreq, sfreq, efreq = comm.split_local(nfreq)
        lm, sm, em = comm.split_local(mmax + 1)

        tstream = np.zeros((lfreq, tel.npairs, self.ntime), dtype=np.complex128)
        for lfi, fi in enumerate(range(sfreq, efreq)):
            tstream[lfi] = self.timestream_f(fi)

        # FFT over time to get the m-modes (device FFT when available).
        from .. import backend

        row_mmodes = backend.fft(tstream, axis=-1) / self.ntime

        ## Combine positive and negative m parts.
        row_mpairs = np.zeros((lfreq, 2, tel.npairs, mmax + 1), dtype=np.complex128)
        row_mpairs[:, 0, ..., 0] = row_mmodes[..., 0]
        for mi in range(1, mmax + 1):
            row_mpairs[:, 0, ..., mi] = row_mmodes[..., mi]
            row_mpairs[:, 1, ..., mi] = row_mmodes[..., -mi].conj()

        # Redistribute to m-major
        col_mmodes = comm.transpose_blocks(
            row_mpairs, (nfreq, 2, tel.npairs, mmax + 1)
        )
        col_mmodes = np.transpose(col_mmodes, (3, 0, 1, 2))

        for lmi, mi in enumerate(range(sm, em)):
            if not os.path.exists(self._mdir(mi)):
                os.makedirs(self._mdir(mi))
            with h5py.File(self._mfile(mi), "w") as f:
                f.create_dataset("/mmode", data=col_mmodes[lmi])
                f.attrs["m"] = mi

        if comm.rank0():
            open(self.output_directory + "/mmodes/COMPLETED_M", "a").close()

        comm.barrier()

    # ===== SVD modes =====

    def _svdfile(self, mi):
        return self._mdir(mi) + "/svd.hdf5"

    def mmode_svd(self, mi):
        with h5py.File(self._svdfile(mi), "r") as f:
            if f["mmode_svd"].shape[0] == 0:
                return np.zeros((0,), dtype=np.complex128)
            return f["mmode_svd"][:]

    def generate_mmodes_svd(self):
        """Project the m-modes into the telescope SVD basis."""
        for mi in comm.mpirange(self.telescope.mmax + 1):
            if os.path.exists(self._svdfile(mi)):
                print("File %s exists. Skipping..." % self._svdfile(mi))
                continue

            tm = self.mmode(mi).reshape(
                self.telescope.nfreq, 2 * self.telescope.npairs
            )
            svdm = self.beamtransfer.project_vector_telescope_to_svd(mi, tm)

            with h5py.File(self._svdfile(mi), "w") as f:
                f.create_dataset("mmode_svd", data=svdm)
                f.attrs["m"] = mi

        comm.barrier()

    # ===== maps from the uncleaned stream =====

    def _collect_alm(self, alm_list, mlist=None):
        tel = self.telescope
        alm = np.zeros(
            (tel.nfreq, tel.num_pol_sky, tel.lmax + 1, tel.lmax + 1),
            dtype=np.complex128,
        )
        if mlist is None:
            mlist = range(tel.mmax + 1)
        for mi in mlist:
            alm[..., mi] = alm_list[mi]
        return alm

    def mapmake_full(self, nside, mapname):
        """Direct pseudo-inverse map from the raw m-modes."""

        def _make_alm(mi):
            print("Making %i" % mi)
            mmode = self.mmode(mi)
            return self.beamtransfer.project_vector_telescope_to_sky(mi, mmode)

        alm_list = comm.parallel_map(_make_alm, list(range(self.telescope.mmax + 1)))

        if comm.rank0():
            alm = self._collect_alm(alm_list)
            skymap = sht.sphtrans_inv_sky(alm, nside)
            with h5py.File(self.output_directory + "/" + mapname, "w") as f:
                f.create_dataset("/map", data=skymap)
        comm.barrier()

    def mapmake_svd(self, nside, mapname):
        """Map from the SVD-projected modes."""
        self.generate_mmodes_svd()

        def _make_alm(mi):
            svdmode = self.mmode_svd(mi)
            return self.beamtransfer.project_vector_svd_to_sky(mi, svdmode)

        alm_list = comm.parallel_map(_make_alm, list(range(self.telescope.mmax + 1)))

        if comm.rank0():
            alm = self._collect_alm(alm_list)
            skymap = sht.sphtrans_inv_sky(alm, nside)
            with h5py.File(self.output_directory + "/" + mapname, "w") as f:
                f.create_dataset("/map", data=skymap)
        comm.barrier()

    # ===== KL modes =====

    def set_kltransform(self, klname, threshold=None):
        self.klname = klname
        if threshold is None:
            kl = self.manager.kltransforms[self.klname]
            threshold = kl.threshold
        self.klthreshold = threshold

    def _klfile(self, mi):
        return self._mdir(mi) + (
            "/klmode_%s_%f.hdf5" % (self.klname, self.klthreshold)
        )

    def mmode_kl(self, mi):
        with h5py.File(self._klfile(mi), "r") as f:
            if f["mmode_kl"].shape[0] == 0:
                return np.zeros((0,), dtype=np.complex128)
            return f["mmode_kl"][:]

    def generate_mmodes_kl(self):
        """Project the SVD modes through the KL filter."""
        kl = self.manager.kltransforms[self.klname]

        for mi in comm.mpirange(self.telescope.mmax + 1):
            if os.path.exists(self._klfile(mi)):
                print("File %s exists. Skipping..." % self._klfile(mi))
                continue

            svdm = self.mmode_svd(mi)
            klm = kl.project_vector_svd_to_kl(mi, svdm, threshold=self.klthreshold)

            with h5py.File(self._klfile(mi), "w") as f:
                f.create_dataset("mmode_kl", data=klm)
                f.attrs["m"] = mi

        comm.barrier()

    def collect_mmodes_kl(self):
        def evfunc(mi):
            evf = np.zeros(self.beamtransfer.ndofmax, dtype=np.complex128)
            ev = self.mmode_kl(mi)
            if ev.size > 0:
                evf[-ev.size :] = ev
            return evf

        if comm.rank0():
            print("Creating eigenvalues file (process 0 only).")

        mlist = list(range(self.telescope.mmax + 1))
        shape = (self.beamtransfer.ndofmax,)
        evarray = kltransform.collect_m_array(mlist, evfunc, shape, np.complex128)

        if comm.rank0():
            fname = self.output_directory + (
                "/klmodes_%s_%f.hdf5" % (self.klname, self.klthreshold)
            )
            if os.path.exists(fname):
                print("File: %s exists. Skipping..." % fname)
                return
            with h5py.File(fname, "w") as f:
                f.create_dataset("evals", data=evarray)

    def fake_kl_data(self):
        """Replace the KL data with a synthetic draw from the KL spectrum."""
        kl = self.manager.kltransforms[self.klname]

        for mi in comm.mpirange(self.telescope.mmax + 1):
            evals = kl.evals_m(mi)

            if evals is None:
                klmode = np.array([], dtype=np.complex128)
            else:
                modeamp = ((evals + 1.0) / 2.0) ** 0.5
                klmode = modeamp * (
                    np.array([1.0, 1.0j])
                    * np.random.standard_normal((modeamp.shape[0], 2))
                ).sum(axis=1)

            if not os.path.exists(self._mdir(mi)):
                os.makedirs(self._mdir(mi))
            with h5py.File(self._klfile(mi), "w") as f:
                f.create_dataset("mmode_kl", data=klmode)
                f.attrs["m"] = mi

        comm.barrier()

    def mapmake_kl(self, nside, mapname, wiener=False):
        """Map from the KL-filtered modes (optionally Wiener weighted)."""
        mapfile = self.output_directory + "/" + mapname
        if os.path.exists(mapfile):
            if comm.rank0():
                print("File %s exists. Skipping..." % mapfile)
            return

        kl = self.manager.kltransforms[self.klname]
        if not kl.inverse:
            raise Exception("Need the inverse to make a meaningful map.")

        def _make_alm(mi):
            print("Making %i" % mi)
            klmode = self.mmode_kl(mi)

            if wiener:
                evals = kl.evals_m(mi, self.klthreshold)
                if evals is not None:
                    klmode *= evals / (1.0 + evals)

            isvdmode = kl.project_vector_kl_to_svd(
                mi, klmode, threshold=self.klthreshold
            )
            return self.beamtransfer.project_vector_svd_to_sky(mi, isvdmode)

        alm_list = comm.parallel_map(_make_alm, list(range(self.telescope.mmax + 1)))

        if comm.rank0():
            mlist = list(range(1 if self.no_m_zero else 0, self.telescope.mmax + 1))
            alm = self._collect_alm(alm_list, mlist)
            skymap = sht.sphtrans_inv_sky(alm, nside)
            with h5py.File(mapfile, "w") as f:
                f.create_dataset("/map", data=skymap)
        comm.barrier()

    # ===== power spectrum from data =====

    @property
    def _psfile(self):
        return self.output_directory + ("/ps_%s.hdf5" % self.psname)

    def set_psestimator(self, psname):
        self.psname = psname

    def powerspectrum(self):
        """Quadratic PS estimate from the KL data."""
        if os.path.exists(self._psfile):
            print("File %s exists. Skipping..." % self._psfile)
            return

        ps = self.manager.psestimators[self.psname]
        ps.genbands()

        def _q_estimate(mi):
            return ps.q_estimator(mi, self.mmode_kl(mi))

        mlist = list(range(1 if self.no_m_zero else 0, self.telescope.mmax + 1))
        qvals = comm.parallel_map(_q_estimate, mlist)

        qtotal = np.array(qvals).sum(axis=0)

        fisher, bias = ps.fisher_bias()
        powerspectrum = np.dot(np.linalg.inv(fisher), qtotal - bias)

        if comm.rank0():
            with h5py.File(self._psfile, "w") as f:
                cv = np.linalg.inv(fisher)
                err = cv.diagonal() ** 0.5
                cr = cv / np.outer(err, err)

                f.create_dataset("fisher", data=fisher)
                f.create_dataset("covariance", data=cv)
                f.create_dataset("error", data=err)
                f.create_dataset("correlation", data=cr)
                f.create_dataset("bandpower", data=ps.band_power)
                f.create_dataset("powerspectrum", data=powerspectrum)

        ps.delbands()
        comm.barrier()
        return powerspectrum

    # ===== pickling =====

    def __getstate__(self):
        state = self.__dict__.copy()
        for key in list(state):
            if key.startswith("_"):
                del state[key]
        return state

    @property
    def _picklefile(self):
        return self.output_directory + "/timestreamobject.pickle"

    def save(self):
        """Pickle the Timestream object into its directory."""
        if comm.rank0():
            with open(self._picklefile, "wb") as f:
                print("=== Saving Timestream object. ===")
                pickle.dump(self, f)

    @classmethod
    def load(cls, tsdir):
        """Load a pickled Timestream."""
        tmp_obj = cls(tsdir, tsdir)
        with open(tmp_obj._picklefile, "rb") as f:
            print("=== Loading Timestream object. ===")
            return pickle.load(f)


def cross_powerspectrum(timestreams, psname, psfile):
    """Cross power spectrum of several timestreams."""
    if os.path.exists(psfile):
        print("File %s exists. Skipping..." % psfile)
        return

    products = timestreams[0].manager
    ps = products.psestimators[psname]
    ps.genbands()

    nstream = len(timestreams)

    def _q_estimate(mi):
        qp = np.zeros((nstream, nstream, ps.nbands), dtype=np.float64)
        for ti in range(nstream):
            for tj in range(ti + 1, nstream):
                print("Making m=%i (%i, %i)" % (mi, ti, tj))
                si = timestreams[ti]
                sj = timestreams[tj]
                qp[ti, tj] = ps.q_estimator(mi, si.mmode_kl(mi), sj.mmode_kl(mi))
                qp[tj, ti] = qp[ti, tj]
        return qp

    mlist = list(
        range(1 if timestreams[0].no_m_zero else 0, products.telescope.mmax + 1)
    )
    qvals = comm.parallel_map(_q_estimate, mlist)
    qtotal = np.array(qvals).sum(axis=0)

    fisher, bias = ps.fisher_bias()

    qtotal = (qtotal - bias).reshape(nstream**2, ps.nbands).T
    powerspectrum = np.dot(np.linalg.inv(fisher), qtotal)
    powerspectrum = powerspectrum.T.reshape(nstream, nstream, ps.nbands)

    if comm.rank0():
        with h5py.File(psfile, "w") as f:
            cv = np.linalg.inv(fisher)
            err = cv.diagonal() ** 0.5
            cr = cv / np.outer(err, err)

            f.create_dataset("fisher", data=fisher)
            f.create_dataset("covariance", data=cv)
            f.create_dataset("error", data=err)
            f.create_dataset("correlation", data=cr)
            f.create_dataset("bandpower", data=ps.band_power)
            f.create_dataset("powerspectrum", data=powerspectrum)

    ps.delbands()
    comm.barrier()
    return powerspectrum


def simulate(m, outdir, maps=[], ndays=None, resolution=0, seed=None, **kwargs):
    """Simulate a visibility timestream and save it to disk.

    Parity with /root/reference/drift/pipeline/timestream.py:645-829: sky
    maps are SHT'd to alm, projected to visibility m-modes through the
    BTM, given a radiometer noise draw and inverse-FFT'd to a timestream.

    Parameters
    ----------
    m : ProductManager
    outdir : str
        Output timestream directory.
    maps : list of str
        Healpix map files whose sum is the simulated sky.
    ndays : int, optional
        Observing days for the noise level (0 = noiseless).
    resolution : float, optional
        Time resolution in seconds (0 = derive from mmax).
    seed : int, optional
        RNG seed (offset by process rank).
    """
    bt = m.beamtransfer
    tel = bt.telescope

    lmax = tel.lmax
    mmax = tel.mmax
    nfreq = tel.nfreq
    npol = tel.num_pol_sky

    projmaps = len(maps) > 0

    lfreq, sfreq, efreq = comm.split_local(nfreq)
    local_freq = list(range(sfreq, efreq))

    lm, sm, em = comm.split_local(mmax + 1)

    if ndays is None:
        ndays = tel.ndays

    if resolution == 0:
        ntime = 2 * mmax + 1
    else:
        ntime = int(np.round(24 * 3600.0 / resolution))

    col_vis = np.zeros((tel.npairs, lfreq, ntime), dtype=np.complex128)

    if projmaps:
        with h5py.File(maps[0], "r") as f:
            mapshape = f["map"].shape

        if lfreq > 0:
            row_map = np.zeros((lfreq,) + mapshape[1:], dtype=np.float64)
            for mapfile in maps:
                with h5py.File(mapfile, "r") as f:
                    row_map += f["map"][sfreq:efreq]

            # Batched SHT of the local frequencies
            row_alm = sht.sphtrans_sky(row_map, lmax=lmax).reshape(
                (lfreq, npol * (lmax + 1), lmax + 1)
            )
        else:
            row_alm = np.zeros(
                (lfreq, npol * (lmax + 1), lmax + 1), dtype=np.complex128
            )

        # Redistribute m-major (trims m > mmax at the same time)
        col_alm = comm.transpose_blocks(row_alm, (nfreq, npol * (lmax + 1), mmax + 1))
        col_alm = np.transpose(col_alm, (2, 0, 1)).reshape(lm, nfreq, npol, lmax + 1)

        vis_data = np.zeros((lm, nfreq, bt.ntel), dtype=np.complex128)
        for mp, mi in enumerate(range(sm, em)):
            vis_data[mp] = bt.project_vector_sky_to_telescope(mi, col_alm[mp])

        row_vis = vis_data.transpose((0, 2, 1))
        col_vis_tmp = comm.transpose_blocks(row_vis, ((mmax + 1), bt.ntel, nfreq))
        col_vis_tmp = col_vis_tmp.reshape(mmax + 1, 2, tel.npairs, lfreq)

        # Unwrap positive/negative m (conjugate only - see the paper)
        col_vis[..., 0] = col_vis_tmp[0, 0]
        for mi in range(1, mmax + 1):
            col_vis[..., mi] = col_vis_tmp[mi, 0]
            col_vis[..., -mi] = col_vis_tmp[mi, 1].conj()

        del col_vis_tmp

    ## Noise realisation
    if ndays > 0:
        noise_ps = tel.noisepower(
            np.arange(tel.npairs)[:, np.newaxis],
            np.array(local_freq)[np.newaxis, :],
            ndays=ndays,
        ).reshape(tel.npairs, lfreq)[:, :, np.newaxis]

        rng = (
            np.random.default_rng(seed + comm.rank())
            if seed is not None
            else np.random.default_rng()
        )
        noise_vis = (
            np.array([1.0, 1.0j]) * rng.standard_normal(col_vis.shape + (2,))
        ).sum(axis=-1)
        noise_vis *= (noise_ps / 2.0) ** 0.5
        col_vis += noise_vis
        del noise_vis

    # Inverse FFT over m to get the timestream.
    from .. import backend

    vis_stream = backend.ifft(col_vis, axis=-1) * ntime
    vis_stream = vis_stream.reshape(tel.npairs, lfreq, ntime)

    tphi = np.linspace(0, 2 * np.pi, ntime, endpoint=False)

    tstream = Timestream(outdir, m)

    for lfi, fi in enumerate(local_freq):
        if not os.path.exists(tstream._fdir(fi)):
            os.makedirs(tstream._fdir(fi))
        with h5py.File(tstream._ffile(fi), "w") as f:
            f.create_dataset("/timestream", data=vis_stream[:, lfi])
            f.create_dataset("/phi", data=tphi)

            f.create_dataset("/feedmap", data=tel.feedmap)
            f.create_dataset("/feedconj", data=tel.feedconj)
            f.create_dataset("/feedmask", data=tel.feedmask)
            f.create_dataset("/uniquepairs", data=tel.uniquepairs)
            f.create_dataset("/baselines", data=tel.baselines)

            f.attrs["beamtransfer_path"] = os.path.abspath(bt.directory)
            f.attrs["ntime"] = ntime

    tstream.save()
    comm.barrier()
    return tstream
