"""Timestream simulation and m-mode analysis.

Behavioural parity with the reference timestream pipeline
(/root/reference/drift/pipeline/timestream.py): the same directory layout
(``timestream_f/<f>/timestream.hdf5``, ``mmodes/<m>/mode.hdf5`` + svd/kl
files, COMPLETED_M marker) and method surface.  Structured here around a
single projection-driven map maker and a shared power-spectrum writer;
FFTs ride the backend (XLA on complex-capable devices), and the per-m
projections are the BeamTransfer/KL einsum paths.
"""

from __future__ import annotations

import logging
import os
import pickle

import h5py
import numpy as np

from ..core import kltransform
from ..ops import sht
from ..parallel import comm
from ..util import util

logger = logging.getLogger(__name__)


def _freq_pattern(base, nfreq):
    return os.path.join(base, "timestream_f", util.natpattern(nfreq))


def _write_map(path, skymap):
    with h5py.File(path, "w") as f:
        f.create_dataset("/map", data=skymap)


def _spectrum_datasets(f, fisher, band_power, powerspectrum):
    """Common contents of every power-spectrum output file."""
    cv = np.linalg.inv(fisher)
    err = np.sqrt(cv.diagonal())
    f.create_dataset("fisher", data=fisher)
    f.create_dataset("covariance", data=cv)
    f.create_dataset("error", data=err)
    f.create_dataset("correlation", data=cv / np.outer(err, err))
    f.create_dataset("bandpower", data=band_power)
    f.create_dataset("powerspectrum", data=powerspectrum)


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

    def _mlist(self):
        """The m indices analysis loops run over (optionally skip m=0)."""
        return list(range(1 if self.no_m_zero else 0, self.telescope.mmax + 1))

    # ===== frequency-ordered timestream files =====

    def _fdir(self, fi):
        return _freq_pattern(self.directory, self.telescope.nfreq) % fi

    def _ffile(self, fi):
        return os.path.join(self._fdir(fi), "timestream.hdf5")

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
        pat = os.path.join(
            self.output_directory, "mmodes", util.natpattern(self.telescope.mmax)
        )
        return pat % abs(mi)

    def _mfile(self, mi):
        return os.path.join(self._mdir(mi), "mode.hdf5")

    def mmode(self, mi):
        """(nfreq, 2, npairs) m-mode of the timestream."""
        with h5py.File(self._mfile(mi), "r") as f:
            return f["mmode"][:]

    def generate_mmodes(self):
        """FFT the timestream into m-modes and store them m-ordered.

        Frequencies are processed locally, then the (freq -> m) reshard
        moves every m to its owner for writing (the reference's
        distributed-transpose step, timestream.py:164).
        """
        marker = os.path.join(self.output_directory, "mmodes", "COMPLETED_M")
        if os.path.exists(marker):
            if comm.rank0():
                logger.info("m-files already generated, skipping")
            return

        tel = self.telescope
        mmax = tel.mmax

        lfreq, sfreq, efreq = comm.split_local(tel.nfreq)
        lm, sm, em = comm.split_local(mmax + 1)

        local = np.stack(
            [self.timestream_f(fi) for fi in range(sfreq, efreq)]
        ) if lfreq else np.zeros((0, tel.npairs, self.ntime), dtype=np.complex128)

        from .. import backend

        fourier = backend.fft(local, axis=-1) / self.ntime

        # pack (+m, -m) pairs: mode m holds (F[m], conj(F[-m]))
        paired = np.zeros((lfreq, 2, tel.npairs, mmax + 1), dtype=np.complex128)
        paired[:, 0] = fourier[..., : mmax + 1]
        paired[:, 1, :, 1:] = np.conj(fourier[..., : -mmax - 1 : -1])

        m_major = comm.transpose_blocks(
            paired, (tel.nfreq, 2, tel.npairs, mmax + 1)
        ).transpose(3, 0, 1, 2)

        for lmi, mi in enumerate(range(sm, em)):
            os.makedirs(self._mdir(mi), exist_ok=True)
            with h5py.File(self._mfile(mi), "w") as f:
                f.create_dataset("/mmode", data=m_major[lmi])
                f.attrs["m"] = mi

        if comm.rank0():
            open(marker, "a").close()
        comm.barrier()

    # ===== SVD modes =====

    def _svdfile(self, mi):
        return os.path.join(self._mdir(mi), "svd.hdf5")

    def mmode_svd(self, mi):
        with h5py.File(self._svdfile(mi), "r") as f:
            if f["mmode_svd"].shape[0] == 0:
                return np.zeros((0,), dtype=np.complex128)
            return f["mmode_svd"][:]

    # m-modes projected per compiled batch in generate_mmodes_svd.
    svd_mbatch = 16

    def generate_mmodes_svd(self):
        """Project the m-modes into the telescope SVD basis.

        The per-m telescope->SVD matvecs run as one device batch per
        m-chunk (the reference instead round-robins single m's over MPI
        ranks, timestream.py:219-231); compaction to each m's retained
        mode count happens at the file boundary.
        """
        from ..core import beamtransfer as btmod

        bt = self.beamtransfer
        tel = self.telescope

        todo = [
            mi
            for mi in comm.mpirange(tel.mmax + 1)
            if not os.path.exists(self._svdfile(mi))
        ]
        if len(todo) < tel.mmax + 1 - len(todo):
            logger.info("Some SVD m-mode files exist; generating %i", len(todo))

        # Subclasses with their own projection policy (NoSVD/FullSVD) go
        # through their per-m method.
        batchable = (
            type(bt).project_vector_telescope_to_svd
            is btmod.BeamTransfer.project_vector_telescope_to_svd
        )
        if not batchable:
            for mi in todo:
                tm = self.mmode(mi).reshape(tel.nfreq, 2 * tel.npairs)
                svdm = bt.project_vector_telescope_to_svd(mi, tm)
                with h5py.File(self._svdfile(mi), "w") as f:
                    f.create_dataset("mmode_svd", data=svdm)
                    f.attrs["m"] = mi
            comm.barrier()
            return

        from ..ops import projections as proj

        mb = max(1, self.svd_mbatch)
        for s in range(0, len(todo), mb):
            chunk = todo[s : s + mb]
            tm = np.stack(
                [self.mmode(mi).reshape(tel.nfreq, bt.ntel) for mi in chunk]
            )
            ut = np.stack([bt.beam_ut(mi) for mi in chunk])  # (M, F, S, T)

            # batched matvec: out[m,f,s] = sum_t U[m,f,s,t] v[m,f,t]
            out = proj.block_matvec(
                ut.reshape(-1, bt.svd_len, bt.ntel),
                tm.reshape(-1, bt.ntel),
            ).reshape(len(chunk), tel.nfreq * bt.svd_len)

            for i, mi in enumerate(chunk):
                idx, _, _ = bt._compact_indices(mi)
                with h5py.File(self._svdfile(mi), "w") as f:
                    f.create_dataset("mmode_svd", data=out[i][idx])
                    f.attrs["m"] = mi

        comm.barrier()

    # ===== map making (one driver, three projections) =====

    def _mapmake(self, nside, mapname, alm_for_m, mlist=None):
        """Shared map maker: gather per-m alm columns, inverse-SHT, write."""
        tel = self.telescope
        if mlist is None:
            mlist = list(range(tel.mmax + 1))

        alm_list = comm.parallel_map(alm_for_m, list(range(tel.mmax + 1)))

        if comm.rank0():
            alm = np.zeros(
                (tel.nfreq, tel.num_pol_sky, tel.lmax + 1, tel.lmax + 1),
                dtype=np.complex128,
            )
            for mi in mlist:
                alm[..., mi] = alm_list[mi]
            skymap = sht.sphtrans_inv_sky(alm, nside)
            _write_map(os.path.join(self.output_directory, mapname), skymap)
        comm.barrier()

    def mapmake_full(self, nside, mapname):
        """Direct pseudo-inverse map from the raw m-modes."""

        def alm_of(mi):
            logger.info("Making %i", mi)
            return self.beamtransfer.project_vector_telescope_to_sky(
                mi, self.mmode(mi)
            )

        self._mapmake(nside, mapname, alm_of)

    def mapmake_svd(self, nside, mapname):
        """Map from the SVD-projected modes."""
        self.generate_mmodes_svd()

        def alm_of(mi):
            return self.beamtransfer.project_vector_svd_to_sky(
                mi, self.mmode_svd(mi)
            )

        self._mapmake(nside, mapname, alm_of)

    def mapmake_kl(self, nside, mapname, wiener=False):
        """Map from the KL-filtered modes (optionally Wiener weighted)."""
        mapfile = os.path.join(self.output_directory, mapname)
        if os.path.exists(mapfile):
            if comm.rank0():
                logger.info("File %s exists. Skipping...", mapfile)
            return

        kl = self.manager.kltransforms[self.klname]
        if not kl.inverse:
            raise Exception("Need the inverse to make a meaningful map.")

        def alm_of(mi):
            logger.info("Making %i", mi)
            klmode = self.mmode_kl(mi)
            if wiener:
                evals = kl.evals_m(mi, self.klthreshold)
                if evals is not None:
                    klmode *= evals / (1.0 + evals)
            svdmode = kl.project_vector_kl_to_svd(
                mi, klmode, threshold=self.klthreshold
            )
            return self.beamtransfer.project_vector_svd_to_sky(mi, svdmode)

        self._mapmake(nside, mapname, alm_of, mlist=self._mlist())

    # ===== KL modes =====

    def set_kltransform(self, klname, threshold=None):
        self.klname = klname
        if threshold is None:
            threshold = self.manager.kltransforms[klname].threshold
        self.klthreshold = threshold

    def _klfile(self, mi):
        return os.path.join(
            self._mdir(mi), f"klmode_{self.klname}_{self.klthreshold:f}.hdf5"
        )

    def mmode_kl(self, mi):
        with h5py.File(self._klfile(mi), "r") as f:
            if f["mmode_kl"].shape[0] == 0:
                return np.zeros((0,), dtype=np.complex128)
            return f["mmode_kl"][:]

    def generate_mmodes_kl(self):
        """Project the SVD modes through the KL filter.

        The per-m KL matvecs run as one device batch per m-chunk, padded
        to the maximum KL dimension and compacted at the file boundary.
        """
        kl = self.manager.kltransforms[self.klname]
        ndofmax = self.beamtransfer.ndofmax

        todo = [
            mi
            for mi in comm.mpirange(self.telescope.mmax + 1)
            if not os.path.exists(self._klfile(mi))
        ]

        from ..ops import projections as proj

        mb = max(1, self.svd_mbatch)
        for s in range(0, len(todo), mb):
            chunk = todo[s : s + mb]

            evecs_pad = np.zeros(
                (len(chunk), ndofmax, ndofmax), dtype=np.complex128
            )
            svd_pad = np.zeros((len(chunk), ndofmax), dtype=np.complex128)
            nkl = np.zeros(len(chunk), dtype=int)
            for i, mi in enumerate(chunk):
                evals, evecs = kl.modes_m(mi, threshold=self.klthreshold)
                if evals is None:
                    continue
                svdm = self.mmode_svd(mi)
                nkl[i] = evecs.shape[0]
                evecs_pad[i, : evecs.shape[0], : evecs.shape[1]] = evecs
                svd_pad[i, : svdm.shape[0]] = svdm

            out = proj.block_matvec(evecs_pad, svd_pad)

            for i, mi in enumerate(chunk):
                with h5py.File(self._klfile(mi), "w") as f:
                    f.create_dataset("mmode_kl", data=out[i, : nkl[i]])
                    f.attrs["m"] = mi

        comm.barrier()

    def collect_mmodes_kl(self):
        """Collect every m's KL data vector into one file."""
        ndofmax = self.beamtransfer.ndofmax

        def padded_kl(mi):
            out = np.zeros(ndofmax, dtype=np.complex128)
            v = self.mmode_kl(mi)
            if v.size:
                out[-v.size :] = v
            return out

        if comm.rank0():
            logger.info("Creating eigenvalues file (process 0 only).")

        evarray = kltransform.collect_m_array(
            list(range(self.telescope.mmax + 1)),
            padded_kl,
            (ndofmax,),
            np.complex128,
        )

        if comm.rank0():
            fname = os.path.join(
                self.output_directory,
                f"klmodes_{self.klname}_{self.klthreshold:f}.hdf5",
            )
            if os.path.exists(fname):
                logger.info("File: %s exists. Skipping...", fname)
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
                amp = np.sqrt((evals + 1.0) / 2.0)
                draw = np.random.standard_normal((amp.size, 2))
                klmode = amp * (draw[:, 0] + 1.0j * draw[:, 1])

            os.makedirs(self._mdir(mi), exist_ok=True)
            with h5py.File(self._klfile(mi), "w") as f:
                f.create_dataset("mmode_kl", data=klmode)
                f.attrs["m"] = mi

        comm.barrier()

    # ===== power spectrum from data =====

    @property
    def _psfile(self):
        return os.path.join(self.output_directory, f"ps_{self.psname}.hdf5")

    def set_psestimator(self, psname):
        self.psname = psname

    def powerspectrum(self):
        """Quadratic PS estimate from the KL data."""
        if os.path.exists(self._psfile):
            logger.info("File %s exists. Skipping...", self._psfile)
            return

        ps = self.manager.psestimators[self.psname]
        ps.genbands()

        qvals = comm.parallel_map(
            lambda mi: ps.q_estimator(mi, self.mmode_kl(mi)), self._mlist()
        )
        qtotal = np.array(qvals).sum(axis=0)

        fisher, bias = ps.fisher_bias()
        powerspectrum = np.linalg.inv(fisher) @ (qtotal - bias)

        if comm.rank0():
            with h5py.File(self._psfile, "w") as f:
                _spectrum_datasets(f, fisher, ps.band_power, powerspectrum)

        ps.delbands()
        comm.barrier()
        return powerspectrum

    # ===== pickling =====

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}

    @property
    def _picklefile(self):
        return os.path.join(self.output_directory, "timestreamobject.pickle")

    def save(self):
        """Pickle the Timestream object into its directory."""
        if comm.rank0():
            with open(self._picklefile, "wb") as f:
                logger.info("=== Saving Timestream object. ===")
                pickle.dump(self, f)

    @classmethod
    def load(cls, tsdir):
        """Load a pickled Timestream."""
        tmp_obj = cls(tsdir, tsdir)
        with open(tmp_obj._picklefile, "rb") as f:
            logger.info("=== Loading Timestream object. ===")
            return pickle.load(f)


def cross_powerspectrum(timestreams, psname, psfile):
    """Cross power spectrum of several timestreams."""
    if os.path.exists(psfile):
        logger.info("File %s exists. Skipping...", psfile)
        return

    products = timestreams[0].manager
    ps = products.psestimators[psname]
    ps.genbands()

    nstream = len(timestreams)

    def q_pairs(mi):
        qp = np.zeros((nstream, nstream, ps.nbands), dtype=np.float64)
        for ti in range(nstream):
            for tj in range(ti + 1, nstream):
                logger.info("Making m=%i (%i, %i)", mi, ti, tj)
                qp[ti, tj] = ps.q_estimator(
                    mi,
                    timestreams[ti].mmode_kl(mi),
                    timestreams[tj].mmode_kl(mi),
                )
                qp[tj, ti] = qp[ti, tj]
        return qp

    qvals = comm.parallel_map(q_pairs, timestreams[0]._mlist())
    qtotal = np.array(qvals).sum(axis=0)

    fisher, bias = ps.fisher_bias()

    flat = (qtotal - bias).reshape(nstream**2, ps.nbands).T
    powerspectrum = (np.linalg.inv(fisher) @ flat).T.reshape(
        nstream, nstream, ps.nbands
    )

    if comm.rank0():
        with h5py.File(psfile, "w") as f:
            _spectrum_datasets(f, fisher, ps.band_power, powerspectrum)

    ps.delbands()
    comm.barrier()
    return powerspectrum


# ===== simulation =====


def _derive_ntime(mmax, resolution):
    if resolution == 0:
        return 2 * mmax + 1
    return int(np.round(24 * 3600.0 / resolution))


def _project_maps_to_vis(bt, maps, lfreq, sfreq, efreq, sm, em, ntime):
    """Sum the input maps, SHT locally in frequency, project each m
    through the BTM, and reshard back to frequency-major visibilities.

    Returns (npairs, lfreq, ntime) complex visibilities.
    """
    tel = bt.telescope
    lmax, mmax, nfreq, npol = tel.lmax, tel.mmax, tel.nfreq, tel.num_pol_sky
    lm = em - sm

    with h5py.File(maps[0], "r") as f:
        mapshape = f["map"].shape

    if lfreq > 0:
        row_map = np.zeros((lfreq,) + mapshape[1:], dtype=np.float64)
        for mapfile in maps:
            with h5py.File(mapfile, "r") as f:
                row_map += f["map"][sfreq:efreq]
        row_alm = sht.sphtrans_sky(row_map, lmax=lmax).reshape(
            (lfreq, npol * (lmax + 1), lmax + 1)
        )
    else:
        row_alm = np.zeros((0, npol * (lmax + 1), lmax + 1), dtype=np.complex128)

    # freq-major alm -> m-major (also trims m > mmax)
    col_alm = comm.transpose_blocks(row_alm, (nfreq, npol * (lmax + 1), mmax + 1))
    col_alm = col_alm.transpose(2, 0, 1).reshape(lm, nfreq, npol, lmax + 1)

    vis_m = np.zeros((lm, nfreq, bt.ntel), dtype=np.complex128)
    for mp, mi in enumerate(range(sm, em)):
        vis_m[mp] = bt.project_vector_sky_to_telescope(mi, col_alm[mp])

    # m-major -> freq-major
    freq_major = comm.transpose_blocks(
        vis_m.transpose(0, 2, 1), (mmax + 1, bt.ntel, nfreq)
    ).reshape(mmax + 1, 2, tel.npairs, lfreq)

    # Unwrap the (+m, -m) pairs into FFT ordering (negative m conjugated)
    vis = np.zeros((tel.npairs, lfreq, ntime), dtype=np.complex128)
    vis[..., : mmax + 1] = freq_major[:, 0].transpose(1, 2, 0)
    vis[..., : -mmax - 1 : -1] = np.conj(freq_major[1:, 1].transpose(1, 2, 0))
    return vis


def _noise_draw(tel, local_freq, shape, ndays, seed):
    """Complex radiometer noise for the local frequency block."""
    noise_ps = tel.noisepower(
        np.arange(tel.npairs)[:, np.newaxis],
        np.array(local_freq)[np.newaxis, :],
        ndays=ndays,
    ).reshape(tel.npairs, len(local_freq), 1)

    rng = (
        np.random.default_rng(seed + comm.rank())
        if seed is not None
        else np.random.default_rng()
    )
    draw = rng.standard_normal(shape + (2,))
    return np.sqrt(noise_ps / 2.0) * (draw[..., 0] + 1.0j * draw[..., 1])


def simulate(m, outdir, maps=[], ndays=None, resolution=0, seed=None, **kwargs):
    """Simulate a visibility timestream and save it to disk.

    Pipeline per the reference
    (/root/reference/drift/pipeline/timestream.py:645-829): sky maps are
    SHT'd to alm, projected to visibility m-modes through the BTM, given a
    radiometer noise draw, and inverse-FFT'd to a timestream.

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

    lfreq, sfreq, efreq = comm.split_local(tel.nfreq)
    local_freq = list(range(sfreq, efreq))
    lm, sm, em = comm.split_local(tel.mmax + 1)

    if ndays is None:
        ndays = tel.ndays
    ntime = _derive_ntime(tel.mmax, resolution)

    if maps:
        col_vis = _project_maps_to_vis(bt, maps, lfreq, sfreq, efreq, sm, em, ntime)
    else:
        col_vis = np.zeros((tel.npairs, lfreq, ntime), dtype=np.complex128)

    if ndays > 0:
        col_vis += _noise_draw(tel, local_freq, col_vis.shape, ndays, seed)

    from .. import backend

    vis_stream = backend.ifft(col_vis, axis=-1) * ntime
    vis_stream = vis_stream.reshape(tel.npairs, lfreq, ntime)

    tphi = np.linspace(0, 2 * np.pi, ntime, endpoint=False)

    tstream = Timestream(outdir, m)

    for lfi, fi in enumerate(local_freq):
        os.makedirs(tstream._fdir(fi), exist_ok=True)
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
