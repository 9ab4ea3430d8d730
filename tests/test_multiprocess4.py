"""Four-process comm + product tests over jax.distributed (CPU).

The 2-process suites (test_multiprocess.py, test_multiprocess_products.py)
mirror the reference's ``mpirun -np 2`` CI job; >2 processes never ran
anywhere, leaving the general-N branches of transpose_blocks,
parallel_map's uniform-array exchange, and the round-robin product
partitioning unproven.  This module runs the same two workers at
NPROC=4 — uneven block splits, spare processes in parallel_map, and a
full product + mapmake run pinned against a single-process referee.

Reference analogue: caput.mpiutil semantics under arbitrary comm size
(/root/reference/drift/core/beamtransfer.py:558-638 round-robin +
transpose; /root/reference/drift/pipeline/timestream.py:246 parallel_map).
"""

import os
import socket
import subprocess
import sys

import h5py
import numpy as np
import pytest

# Parent reads bitshuffle+LZ4-compressed products written by the workers.
import driftscan_tpu  # noqa: F401

pytestmark = pytest.mark.slow

NPROC = 4

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


def _launch(script, nproc, port, arg, env):
    return [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(nproc), str(port), arg],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for pid in range(nproc)
    ]


def _await(procs, timeout):
    outs = [p.communicate(timeout=timeout) for p in procs]
    for p, (_, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-3000:]}"


@pytest.fixture(scope="module")
def verb_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp4"))
    script = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = _launch(script, NPROC, _free_port(), outdir, env)
    _await(procs, 300)
    return [
        dict(np.load(f"{outdir}/worker_{pid}.npz")) for pid in range(NPROC)
    ]


def test_identity_and_bcast(verb_results):
    for pid, res in enumerate(verb_results):
        assert int(res["rank"]) == pid
        assert int(res["size"]) == NPROC
        np.testing.assert_array_equal(res["bcast"], [3, 1, 4, 0])


def test_allreduce_4(verb_results):
    base = np.arange(6, dtype=np.float64).reshape(2, 3)
    want = base * sum(r + 1 for r in range(NPROC))
    for res in verb_results:
        np.testing.assert_allclose(res["allreduce"], want)


def test_parallel_map_4(verb_results):
    """5 items over 4 processes: full ordered results on every process."""
    want = np.array([[x * 2.0, x + 0.5] for x in range(5)])
    for res in verb_results:
        np.testing.assert_allclose(res["pmap"], want)


def test_parallel_map_spares_idle(verb_results):
    """1 item, 4 processes: 3 spares idle (caput semantics), no abort."""
    for res in verb_results:
        np.testing.assert_allclose(res["pmap_short"], [[42.0]])


def test_collect_m_array_4(verb_results):
    want = np.repeat(np.arange(6.0)[:, None], 3, axis=1)
    for res in verb_results:
        np.testing.assert_allclose(res["collect"], want)


def test_transpose_blocks_4(verb_results):
    """Uneven 4-way row blocks (5 = 2+1+1+1) -> uneven column blocks
    (7 = 2+2+2+1), bit-exact on every process."""
    for res in verb_results:
        np.testing.assert_array_equal(
            res["transpose"], res["transpose_expected"]
        )


def test_round_robin_partitions_4(verb_results):
    want_mpirange = [[0, 4], [1, 5], [2, 6], [3]]
    want_split = [(3, 0, 3), (3, 3, 6), (2, 6, 8), (2, 8, 10)]
    for pid, res in enumerate(verb_results):
        np.testing.assert_array_equal(res["mpirange"], want_mpirange[pid])
        np.testing.assert_array_equal(res["split_local"], want_split[pid])


# ---------------------------------------------------------------------------
# Full product generation + timestream mapmake at 4 processes, pinned
# against a single-process referee run of the same worker.
# ---------------------------------------------------------------------------


def _write_config(base, name):
    out = base / name
    cfile = base / f"{name}.yaml"
    cfile.write_text(CONFIG.format(out=out))
    return str(cfile), str(out)


@pytest.fixture(scope="module")
def product_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("mp4_products")
    script = os.path.join(os.path.dirname(__file__), "mp_product_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)

    cfile_mp, out_mp = _write_config(base, "np4")
    procs = _launch(script, NPROC, _free_port(), cfile_mp, env)
    _await(procs, 600)

    cfile_sp, out_sp = _write_config(base, "sp")
    p = subprocess.run(
        [sys.executable, script, "0", "1", str(_free_port()), cfile_sp],
        env=env,
        capture_output=True,
        timeout=600,
    )
    assert p.returncode == 0, f"single worker failed:\n{p.stderr.decode()[-3000:]}"
    return out_mp, out_sp


def _read(path, dset):
    with h5py.File(path, "r") as f:
        return f[dset][:]


def test_products_match_single_process(product_dirs):
    """beam_m / KL spectrum / Fisher at 4 processes == 1 process."""
    out_mp, out_sp = product_dirs

    mdirs = [
        d
        for d in sorted(os.listdir(os.path.join(out_sp, "bt", "beam_m")))
        if d.isdigit()
    ]
    assert mdirs
    for d in mdirs:
        b_sp = _read(f"{out_sp}/bt/beam_m/{d}/beam.hdf5", "beam_m")
        b_mp = _read(f"{out_mp}/bt/beam_m/{d}/beam.hdf5", "beam_m")
        np.testing.assert_allclose(b_mp, b_sp, rtol=1e-8, atol=1e-10)

    ev_sp = _read(f"{out_sp}/bt/kl/evals.hdf5", "evals")
    ev_mp = _read(f"{out_mp}/bt/kl/evals.hdf5", "evals")
    scale = max(np.abs(ev_sp).max(), 1e-30)
    np.testing.assert_allclose(ev_mp, ev_sp, rtol=1e-5, atol=1e-8 * scale)

    f_sp = _read(f"{out_sp}/bt/kl/ps1/fisher.hdf5", "fisher")
    f_mp = _read(f"{out_mp}/bt/kl/ps1/fisher.hdf5", "fisher")
    scale = max(np.abs(f_sp).max(), 1e-30)
    np.testing.assert_allclose(f_mp, f_sp, rtol=1e-6, atol=1e-9 * scale)


def test_mapmake_match_4(product_dirs):
    """Noiseless sim + mapmake at 4 processes == 1 process."""
    out_mp, out_sp = product_dirs
    base_mp = os.path.dirname(out_mp)
    base_sp = os.path.dirname(out_sp)
    for name in ("map_full.hdf5", "map_svd.hdf5"):
        m_sp = _read(os.path.join(base_sp, "sp_ts", name), "map")
        m_mp = _read(os.path.join(base_mp, "np4_ts", name), "map")
        scale = max(np.abs(m_sp).max(), 1e-30)
        np.testing.assert_allclose(m_mp, m_sp, rtol=1e-6, atol=1e-8 * scale)
