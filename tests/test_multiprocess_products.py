"""Two-process end-to-end product generation == single-process products.

The analogue of the reference running its whole pipeline under
``mpirun -np 2`` (/root/reference/tests/test_functional.py:70-76): two
real jax.distributed processes run ProductManager.generate() on the
functional config — exercising the file-based chunk/transpose/barrier
choreography in BeamTransfer (beamtransfer.py:228-351), round-robin m
partitioning in KLTransform, and the Fisher allreduce — and the parent
asserts the HDF5 products tier-match a single-process run.
"""

import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

# The parent reads bitshuffle+LZ4-compressed products the workers wrote:
# importing driftscan_tpu registers the native filter plugin with HDF5
# (the documented consumer requirement, ops/bitshuffle.py:28-35).
import driftscan_tpu  # noqa: F401

# Bench-scale suite: excluded from the default fast tier (see pyproject.toml)
pytestmark = pytest.mark.slow


NPROC = 2

CONFIG = """
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           Yes
    output_directory:   "{out}"
    truncate:           false

telescope:
    type:               PolarisedCylinder
    num_freq:           2
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      1
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0

kltransform:
    -   type:           KLTransform
        name:           kl

psfisher:
    -   type:           MonteCarlo
        name:           ps1
        klname:         kl
        nsamples:       100
        seed:           42
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_config(base, name):
    out = base / name
    cfile = base / f"{name}.yaml"
    cfile.write_text(CONFIG.format(out=out))
    return str(cfile), str(out)


@pytest.fixture(scope="module")
def product_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mp_products")
    script = os.path.join(os.path.dirname(__file__), "mp_product_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children use 1 CPU device each

    # --- 2-process run ---
    cfile_mp, out_mp = _write_config(base, "mp")
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(NPROC), str(port), cfile_mp],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for pid in range(NPROC)
    ]
    outs = [p.communicate(timeout=500) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-3000:]}"

    # --- single-process run (same worker, cluster of 1) ---
    cfile_sp, out_sp = _write_config(base, "sp")
    port = _free_port()
    p = subprocess.run(
        [sys.executable, script, "0", "1", str(port), cfile_sp],
        env=env,
        capture_output=True,
        timeout=500,
    )
    assert p.returncode == 0, f"single worker failed:\n{p.stderr.decode()[-3000:]}"

    return out_mp, out_sp


def _read(path, dset):
    with h5py.File(path, "r") as f:
        return f[dset][:]


def test_beam_m_match(product_dirs):
    """Per-m beam files: the MPI-parallel BTM phase must reproduce the
    single-process transfer matrices (reference tier rel 1e-4 / abs 1e-8;
    here both runs are f64 CPU so the match is much tighter)."""
    out_mp, out_sp = product_dirs
    mdirs = sorted(os.listdir(os.path.join(out_sp, "bt", "beam_m")))
    mdirs = [d for d in mdirs if d.isdigit()]
    assert mdirs, "no beam_m products found"
    for d in mdirs:
        b_sp = _read(f"{out_sp}/bt/beam_m/{d}/beam.hdf5", "beam_m")
        b_mp = _read(f"{out_mp}/bt/beam_m/{d}/beam.hdf5", "beam_m")
        np.testing.assert_allclose(b_mp, b_sp, rtol=1e-8, atol=1e-10)


def test_svd_spectrum_match(product_dirs):
    out_mp, out_sp = product_dirs
    s_sp = _read(f"{out_sp}/bt/svdspectrum.hdf5", "singularvalues")
    s_mp = _read(f"{out_mp}/bt/svdspectrum.hdf5", "singularvalues")
    scale = max(s_sp.max(), 1e-30)
    np.testing.assert_allclose(s_mp, s_sp, rtol=1e-6, atol=1e-9 * scale)


def test_kl_spectrum_match(product_dirs):
    out_mp, out_sp = product_dirs
    ev_sp = _read(f"{out_sp}/bt/kl/evals.hdf5", "evals")
    ev_mp = _read(f"{out_mp}/bt/kl/evals.hdf5", "evals")
    assert ev_mp.shape == ev_sp.shape
    scale = max(np.abs(ev_sp).max(), 1e-30)
    np.testing.assert_allclose(ev_mp, ev_sp, rtol=1e-5, atol=1e-8 * scale)


def test_mapmake_match(product_dirs):
    """Map-making under 2 processes == single process (noiseless sim, so
    the only differences would come from the process partitioning of the
    parallel_map/mpirange loops in pipeline/timestream.py)."""
    out_mp, out_sp = product_dirs
    base_mp = os.path.dirname(out_mp)
    base_sp = os.path.dirname(out_sp)
    for name in ("map_full.hdf5", "map_svd.hdf5"):
        m_sp = _read(os.path.join(base_sp, "sp_ts", name), "map")
        m_mp = _read(os.path.join(base_mp, "mp_ts", name), "map")
        scale = max(np.abs(m_sp).max(), 1e-30)
        np.testing.assert_allclose(m_mp, m_sp, rtol=1e-6, atol=1e-8 * scale)


def test_fisher_match(product_dirs):
    """Monte-Carlo Fisher: per-(seed, m) RNG makes the accumulation
    deterministic under any process partitioning — the 2-process total
    must equal the single-process one."""
    out_mp, out_sp = product_dirs
    f_sp = _read(f"{out_sp}/bt/kl/ps1/fisher.hdf5", "fisher")
    f_mp = _read(f"{out_mp}/bt/kl/ps1/fisher.hdf5", "fisher")
    scale = max(np.abs(f_sp).max(), 1e-30)
    np.testing.assert_allclose(f_mp, f_sp, rtol=1e-6, atol=1e-9 * scale)
