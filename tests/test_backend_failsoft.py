"""Backend capability probes must fail soft when the accelerator is dead.

Round 2 lost all six north-star attempts because ``skymodel`` probed
``backend.device_f32_only()`` from pure host math and the probe raised
``UNAVAILABLE`` out of a dead TPU tunnel (doc/northstar_run.log).  These
tests simulate backend-init failure and require that

* every capability probe returns a CPU-semantics answer instead of
  raising;
* the failure answer is NOT pinned — once the backend initialises, the
  probes return the real platform's answer;
* the north-star host prep (signal/foreground covariance build) runs to
  completion with no accelerator.
"""

import numpy as np
import pytest

from driftscan_tpu import backend


class _Unavailable(RuntimeError):
    pass


@pytest.fixture
def dead_backend(monkeypatch):
    """Make backend init raise, as a dead axon tunnel does."""
    backend.split_complex.cache_clear()
    backend.has_device_fft.cache_clear()
    backend.device_f32_only.cache_clear()

    def boom():
        raise _Unavailable("UNAVAILABLE: no TPU for you")

    monkeypatch.setattr(backend, "_cached_platform", boom)
    monkeypatch.setattr(backend, "_platform_fail_until", 0.0)
    yield
    backend.split_complex.cache_clear()
    backend.has_device_fft.cache_clear()
    backend.device_f32_only.cache_clear()


def test_probes_fail_soft(dead_backend):
    assert backend.backend_platform() is None
    assert backend.device_available() is False
    assert backend.split_complex() is False
    assert backend.device_f32_only() is False
    assert backend.has_device_fft() is True


def test_failure_not_pinned(dead_backend, monkeypatch):
    assert backend.split_complex() is False
    # device comes back as a complex-free TPU
    monkeypatch.setattr(backend, "_cached_platform", lambda: "tpu")
    monkeypatch.setattr(backend, "_platform_fail_until", 0.0)
    assert backend.split_complex() is True
    assert backend.device_f32_only() is True
    assert backend.has_device_fft() is False


def test_env_override_wins_during_outage(dead_backend, monkeypatch):
    monkeypatch.setenv("DRIFTSCAN_TPU_SPLIT_COMPLEX", "1")
    backend.split_complex.cache_clear()
    assert backend.split_complex() is True


def test_fft_routes_to_host_during_outage(dead_backend):
    x = np.exp(2j * np.pi * np.arange(16) / 16.0)
    out = backend.fft(x)
    np.testing.assert_allclose(out, np.fft.fft(x), rtol=1e-12, atol=1e-12)
    back = backend.ifft(out)
    np.testing.assert_allclose(back, x, rtol=1e-10, atol=1e-12)


def test_covariance_build_survives_outage(dead_backend):
    """The north-star prep (reference drift/core/skymodel.py:20-67 is
    host-only there too) must finish with no accelerator at all."""
    from driftscan_tpu.core import skymodel

    freqs = np.linspace(400.0, 450.0, 4)
    cl_s = skymodel.im21cm_model(8, freqs, 1)
    cl_f = skymodel.foreground_model(8, freqs, 1)
    assert np.isfinite(cl_s).all() and np.isfinite(cl_f).all()
    assert cl_s.shape[-3:] == (9, 4, 4)
