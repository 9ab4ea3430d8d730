"""Precision truncation: numpy fallback semantics + native C++ parity."""

import os
import subprocess

import numpy as np
import pytest

from driftscan_tpu.ops import truncate


def _data(n=6, k=32, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((n, k)) + 1j * rng.standard_normal((n, k))
    ).astype(np.complex128)


def test_numpy_fallback_semantics(monkeypatch):
    monkeypatch.setattr(truncate, "_load_native", lambda: False)
    a = _data()
    b = a.copy()
    truncate.bit_truncate_max_complex(b, 1e-3, 1e-4)

    # Bounded relative error, and values actually changed (compressible)
    rel = np.abs(a - b) / np.abs(a)
    assert rel.max() < 2e-3
    assert (a != b).mean() > 0.5

    # Idempotent: truncating again changes nothing
    c = b.copy()
    truncate.bit_truncate_max_complex(c, 1e-3, 1e-4)
    np.testing.assert_array_equal(b, c)


def test_tiny_values_flushed(monkeypatch):
    monkeypatch.setattr(truncate, "_load_native", lambda: False)
    a = _data()
    a[:, 5] = 1e-12  # far below maxl * rowmax
    b = a.copy()
    truncate.bit_truncate_max_complex(b, 1e-3, 1e-4)
    assert np.all(b[:, 5] == 0.0)


@pytest.fixture(scope="module")
def native_lib():
    path = os.path.join(
        os.path.dirname(truncate.__file__), "..", "native", "libdrifttrunc.so"
    )
    if not os.path.exists(path):
        makedir = os.path.dirname(path)
        try:
            subprocess.run(["make", "-C", makedir], check=True, capture_output=True)
        except Exception:
            pytest.skip("native truncate library not buildable")
    truncate._lib = None  # force reload
    lib = truncate._load_native()
    if not lib:
        pytest.skip("native truncate library not loadable")
    return lib


def test_native_matches_numpy(native_lib, monkeypatch):
    a = _data(seed=3)

    b_native = a.copy()
    truncate.bit_truncate_max_complex(b_native, 1e-3, 1e-4)

    monkeypatch.setattr(truncate, "_load_native", lambda: False)
    b_numpy = a.copy()
    truncate.bit_truncate_max_complex(b_numpy, 1e-3, 1e-4)

    np.testing.assert_array_equal(b_native, b_numpy)


class TestProductCompression:
    """Truncation + byte-shuffle + lzf is the storage contract
    (reference: bitshuffle+LZ4 with bit truncation on by default,
    /root/reference/drift/core/beamtransfer.py:549-555,641-646)."""

    def test_beam_files_truncated_and_compressed(self, tmp_path):
        import h5py
        import yaml

        from driftscan_tpu.core import manager

        conf = yaml.safe_load(
            f"""
config:
    beamtransfers:  Yes
    kltransform:    No
    psfisher:       No
    output_directory: "{tmp_path}/prod"

telescope:
    type:           UnpolarisedCylinder
    num_freq:       2
    freq_start:     100.0
    freq_end:       110.0
    freq_mode:      edge
    num_cylinders:  2
    cylinder_width: 2.0
    num_feeds:      2
    feed_spacing:   1.5
"""
        )
        m = manager.ProductManager()
        m.apply_config(conf)
        assert m.beamtransfer.truncate  # on by default
        m.generate()

        with h5py.File(m.beamtransfer._mfile(0), "r") as f:
            dset = f["beam_m"]
            # default codec: native bitshuffle+LZ4 (filter 32008) when the
            # plugin built, else the LZF+shuffle fallback
            from driftscan_tpu.ops import bitshuffle as bs

            filters = dset._filters
            if bs.available():
                assert str(bs.BSHUF_FILTER) in filters
            else:
                assert dset.compression == "lzf" and dset.shuffle
            vals = dset[:]

        # truncated mantissas: values must round-trip through the
        # truncation operator unchanged (it is idempotent)
        from driftscan_tpu.ops import truncate as tr

        flat = vals.reshape(-1, vals.shape[-1]).copy()
        tr.bit_truncate_max_complex(flat, 1e-7, 1e-8)
        np.testing.assert_array_equal(flat, vals.reshape(-1, vals.shape[-1]))


class TestBitshuffleCodec:
    """The native bitshuffle+LZ4 HDF5 filter (ops.bitshuffle)."""

    def test_roundtrip_and_ratio(self, tmp_path):
        import h5py

        from driftscan_tpu.ops import bitshuffle as bs
        from driftscan_tpu.ops import truncate as tr

        if not bs.available():
            import pytest

            pytest.skip("bitshuffle plugin unavailable")

        rng = np.random.default_rng(0)
        x = (
            rng.standard_normal((32, 3000)) + 1j * rng.standard_normal((32, 3000))
        ).astype(np.complex128)
        tr.bit_truncate_max_complex(x, 1e-7, 1e-8)

        sizes = {}
        for name, kw in (
            ("bshuf", bs.compression_kwargs(x.dtype, "bitshuffle")),
            ("lzf", bs.compression_kwargs(x.dtype, "lzf")),
        ):
            fn = str(tmp_path / f"{name}.h5")
            with h5py.File(fn, "w") as f:
                f.create_dataset("x", data=x, chunks=(4, 750), **kw)
            with h5py.File(fn, "r") as f:
                np.testing.assert_array_equal(f["x"][:], x)
            import os

            sizes[name] = os.path.getsize(fn)
        # bitshuffle must beat byte-shuffle+LZF on truncated mantissas
        assert sizes["bshuf"] < sizes["lzf"]

    def test_odd_shapes_roundtrip(self, tmp_path):
        """Partial blocks and non-multiple-of-8 tails must round-trip."""
        import h5py

        from driftscan_tpu.ops import bitshuffle as bs

        if not bs.available():
            import pytest

            pytest.skip("bitshuffle plugin unavailable")

        rng = np.random.default_rng(1)
        for shape, dt in (((13,), np.float32), ((7, 9), np.float64),
                          ((4097,), np.complex64), ((3, 5, 11), np.int32)):
            x = (rng.standard_normal(np.prod(shape)) * 100).astype(dt).reshape(shape)
            fn = str(tmp_path / f"odd_{dt.__name__}_{len(shape)}.h5")
            with h5py.File(fn, "w") as f:
                f.create_dataset("x", data=x, chunks=shape, **bs.dataset_kwargs(dt))
            with h5py.File(fn, "r") as f:
                np.testing.assert_array_equal(f["x"][:], x)
