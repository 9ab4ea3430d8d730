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
