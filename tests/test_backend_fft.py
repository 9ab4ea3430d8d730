"""The split-complex matmul DFT must match numpy's FFT exactly enough for
the timestream round trip (VERDICT r1 Next #8: device FFT for
generate_mmodes/simulate on complex-free accelerators)."""

import numpy as np
import pytest

import driftscan_tpu.backend as backend


@pytest.fixture
def split_backend(monkeypatch):
    monkeypatch.setattr(backend, "has_device_fft", lambda: False)
    yield


@pytest.mark.parametrize("n", [8, 63, 461])  # even, odd, prime
def test_matmul_dft_matches_numpy(split_backend, n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))

    np.testing.assert_allclose(
        backend.fft(x), np.fft.fft(x, axis=-1), rtol=1e-10, atol=1e-9 * n
    )
    np.testing.assert_allclose(
        backend.ifft(x), np.fft.ifft(x, axis=-1), rtol=1e-10, atol=1e-9
    )


def test_matmul_dft_other_axis(split_backend):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 4, 2)) + 1j * rng.standard_normal((5, 4, 2))
    np.testing.assert_allclose(
        backend.fft(x, axis=0), np.fft.fft(x, axis=0), rtol=1e-10, atol=1e-8
    )


def test_roundtrip(split_backend):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 97)) + 1j * rng.standard_normal((2, 97))
    np.testing.assert_allclose(backend.ifft(backend.fft(x)), x, atol=1e-9)


def test_long_transform_falls_back_to_host(split_backend):
    n = backend._MATMUL_DFT_MAX + 1
    x = np.zeros((1, n), dtype=np.complex128)
    x[0, 1] = 1.0
    np.testing.assert_allclose(backend.fft(x), np.fft.fft(x, axis=-1), atol=1e-9)
