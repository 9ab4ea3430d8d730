import numpy as np

from driftscan_tpu.parallel import comm, mesh


def test_split():
    num, start, end = comm.split_local(10)
    assert (num, start, end) == (10, 0, 10)

    pieces = comm.split_m(10, 3)
    assert pieces.shape == (3, 3)
    assert pieces[0].sum() == 10
    assert list(pieces[1]) == [0, 4, 7]
    assert list(pieces[2]) == [4, 7, 10]


def test_partition_and_range():
    assert comm.mpirange(5) == [0, 1, 2, 3, 4]
    assert comm.partition_list_mpi([5, 6, 7]) == [5, 6, 7]
    assert comm.partition_list([0, 1, 2, 3, 4], 1, 2) == [1, 3]


def test_parallel_map():
    assert comm.parallel_map(lambda x: x * 2, [1, 2, 3]) == [2, 4, 6]


def test_transpose_blocks_single():
    arr = np.arange(24).reshape(4, 3, 2)
    out = comm.transpose_blocks(arr, (4, 3, 2))
    assert np.array_equal(out, arr)
    trimmed = comm.transpose_blocks(arr, (4, 3, 1))
    assert trimmed.shape == (4, 3, 1)


def test_mesh_virtual_devices():
    m = mesh.get_mesh()
    assert mesh.n_devices() == 8
    assert mesh.pad_batch(9) == 16

    import jax.numpy as jnp

    x = jnp.zeros((16, 4))
    xs = mesh.shard_batch(x)
    assert xs.shape == (16, 4)
