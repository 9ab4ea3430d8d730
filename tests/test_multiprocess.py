"""Multi-process comm-verb tests: 2 real processes over jax.distributed.

The analogue of the reference's ``mpirun -np 2`` functional tests
(/root/reference/tests/test_functional.py:70-76): two subprocesses join a
localhost jax.distributed cluster (CPU backend) and run every comm verb;
the parent asserts the collected results.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mp"))
    port = _free_port()
    script = os.path.join(os.path.dirname(__file__), "mp_worker.py")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children use 1 CPU device each

    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(NPROC), str(port), outdir],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for pid in range(NPROC)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{se.decode()[-2000:]}"

    return [
        dict(np.load(f"{outdir}/worker_{pid}.npz")) for pid in range(NPROC)
    ]


def test_identity(worker_results):
    for pid, res in enumerate(worker_results):
        assert int(res["rank"]) == pid
        assert int(res["size"]) == NPROC


def test_bcast(worker_results):
    # both processes must hold rank 0's object
    for res in worker_results:
        np.testing.assert_array_equal(res["bcast"], [3, 1, 4, 0])


def test_allreduce(worker_results):
    base = np.arange(6, dtype=np.float64).reshape(2, 3)
    want = base * sum(r + 1 for r in range(NPROC))
    for res in worker_results:
        np.testing.assert_allclose(res["allreduce"], want)


def test_parallel_map_full_everywhere(worker_results):
    want = np.array([[x * 2.0, x + 0.5] for x in range(5)])
    for res in worker_results:
        np.testing.assert_allclose(res["pmap"], want)


def test_parallel_map_more_processes_than_items(worker_results):
    """Spare processes idle (caput semantics) instead of raising."""
    for res in worker_results:
        np.testing.assert_allclose(res["pmap_short"], [[42.0]])


def test_collect_m_array(worker_results):
    want = np.repeat(np.arange(6.0)[:, None], 3, axis=1)
    for res in worker_results:
        np.testing.assert_allclose(res["collect"], want)


def test_transpose_blocks(worker_results):
    """Each process ends with its own column block, bit-exact."""
    for res in worker_results:
        np.testing.assert_array_equal(res["transpose"], res["transpose_expected"])


def test_round_robin_partitions(worker_results):
    r0, r1 = worker_results
    np.testing.assert_array_equal(r0["mpirange"], [0, 2, 4, 6])
    np.testing.assert_array_equal(r1["mpirange"], [1, 3, 5])
    np.testing.assert_array_equal(r0["split_local"], [5, 0, 5])
    np.testing.assert_array_equal(r1["split_local"], [5, 5, 10])
