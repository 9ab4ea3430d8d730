"""Worker: full product generation under an N-process jax.distributed cluster.

The end-to-end analogue of the reference's ``mpirun -np 2
drift-makeproducts`` CI run (/root/reference/tests/test_functional.py:70-76):
every process joins the cluster and runs ProductManager.generate() — the
file-based chunking/transpose/barrier choreography in beamtransfer and the
round-robin m partitioning in kltransform/psestimation are all live.

Run: python mp_product_worker.py <process_id> <num_processes> <port> <config>
"""

import sys


def main():
    pid, nproc, port, cfile = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    # Pin the CPU backend through jax.config (the TPU plugin ignores
    # JAX_PLATFORMS; two workers opening the real chip would collide).
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from driftscan_tpu.core import manager

    m = manager.ProductManager.from_config(cfile)
    m.generate()


if __name__ == "__main__":
    main()
