"""Backend capability detection and compute-path routing.

Some TPU runtimes execute complex arithmetic natively; others (including
the one this framework targets first) implement only real f32/f64 math,
no complex dtypes, no XLA SVD and no FFT.  The hot paths therefore have
two implementations:

* a native-complex path (CPU/GPU, complex-capable TPUs);
* a split-complex path carrying (re, im) planes (ops.zarray), with
  SVD via Gram eigendecompositions.

Routing is by platform with an environment override
(``DRIFTSCAN_TPU_SPLIT_COMPLEX=0/1``).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax

_COMPLEX_OK_PLATFORMS = {"cpu", "gpu", "cuda", "rocm"}

# Backend-init failure is cached for a short TTL only: a probe made while
# the accelerator is unreachable must not pin CPU semantics for the whole
# process (the device may come back; jax retries init on the next call).
_PLATFORM_FAIL_TTL_S = 60.0
_platform_fail_until = 0.0


@lru_cache(maxsize=1)
def _cached_platform() -> str:
    # raises on init failure — lru_cache does not cache exceptions, so
    # only a *successful* probe is remembered
    return jax.default_backend()


def backend_platform():
    """Default backend platform, or None when backend init fails.

    Capability probes must FAIL SOFT: pure host work (covariance builds,
    factor caches) calls them only to pick dtypes/paths, and a dead
    accelerator tunnel must not abort it (round 2 lost six north-star
    attempts to exactly this — skymodel.py probing ``device_f32_only``
    raised UNAVAILABLE out of host-only math).  Callers get None and
    should assume CPU semantics; the answer is un-cached so the probe
    recovers once the device appears.
    """
    global _platform_fail_until
    import time

    if time.time() < _platform_fail_until:
        return None
    try:
        return _cached_platform()
    except Exception:
        _platform_fail_until = time.time() + _PLATFORM_FAIL_TTL_S
        return None


def device_available() -> bool:
    """True iff the default backend initialised (fail-soft, TTL-cached).

    Host-only stages use this to route one-off builds to host BLAS when
    the accelerator is unreachable, instead of crashing on a jnp call.
    """
    return backend_platform() is not None


def _soft_cached(fn):
    """Cache ``fn()`` only once the backend platform is known.

    Keeps the ``cache_clear()`` API of the lru_cache originals.  While
    the backend is unreachable the value is recomputed every call (env
    overrides still apply), so nothing wrong gets pinned.
    """
    cache = {}

    def wrapper():
        if "v" in cache:
            return cache["v"]
        val, cacheable = fn()
        if cacheable:
            cache["v"] = val
        return val

    def cache_clear():
        cache.clear()
        # _cached_platform may be monkeypatched to a bare function in tests
        clear = getattr(_cached_platform, "cache_clear", None)
        if clear is not None:
            clear()
        global _platform_fail_until
        _platform_fail_until = 0.0

    wrapper.cache_clear = cache_clear
    wrapper.__name__ = fn.__name__
    wrapper.__doc__ = fn.__doc__
    return wrapper


@_soft_cached
def split_complex():
    """True if the hot paths should use the split-complex implementation."""
    env = os.environ.get("DRIFTSCAN_TPU_SPLIT_COMPLEX")
    if env is not None:
        return env not in ("0", "false", "False"), True
    plat = backend_platform()
    if plat is None:
        return False, False  # CPU semantics while the device is absent
    return plat not in _COMPLEX_OK_PLATFORMS, True


@_soft_cached
def device_f32_only():
    """True if device math should be forced to f32 planes.

    On runtimes that emulate f64 as a float32 pair, fused f64 programs
    compile pathologically (minutes-to-never) and run no more accurately
    than the chip's native f32; the dispatchers therefore downcast device
    operands to f32 on such backends (override with
    ``DRIFTSCAN_TPU_DEVICE_F64=1`` to experiment).
    """
    env = os.environ.get("DRIFTSCAN_TPU_DEVICE_F64")
    if env is not None:
        return env in ("0", "false", "False"), True
    plat = backend_platform()
    if plat is None:
        return False, False
    return plat not in _COMPLEX_OK_PLATFORMS, True


def device_real(x):
    """Contiguous real array with the device compute dtype applied."""
    import numpy as np

    x = np.ascontiguousarray(x)
    if device_f32_only() and x.dtype == np.float64:
        return x.astype(np.float32)
    return x


@_soft_cached
def has_device_fft():
    """True if the default backend implements FFT (complex-capable)."""
    env = os.environ.get("DRIFTSCAN_TPU_DEVICE_FFT")
    if env is not None:
        return env not in ("0", "false", "False"), True
    plat = backend_platform()
    if plat is None:
        return True, False  # CPU semantics (numpy FFT path works host-side)
    return plat in _COMPLEX_OK_PLATFORMS, True


# Largest transform length served by the matmul DFT on complex-free
# accelerators: one (n, n) f64 coefficient pair = 2 * n^2 * 8 bytes
# (n = 4096 -> 268 MB) and the contraction is a single MXU matmul.
_MATMUL_DFT_MAX = 4096


@lru_cache(maxsize=8)
def _dft_coeffs(n: int, sign: int):
    """Host-cached DFT coefficient planes W = cos + i*sign*sin, (n, n)."""
    import numpy as np

    jk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
    return (
        np.cos(jk).astype(np.float64),
        (sign * np.sin(jk)).astype(np.float64),
    )


def _matmul_dft(x, axis: int, inverse: bool):
    """Split-complex DFT as one MXU matmul per plane pair.

    Exact DFT semantics (matching np.fft.fft / ifft including the 1/n
    inverse normalisation), built only from real matmuls — the FFT for
    accelerators without complex support.  O(n^2) per transform, which
    the MXU turns into throughput for the m-mode regime (n ~ 2*mmax+1).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = np.asarray(x)
    n = x.shape[axis]
    cos, sin = _dft_coeffs(n, 1 if inverse else -1)

    xr = np.ascontiguousarray(np.moveaxis(x.real, axis, -1))
    xi = np.ascontiguousarray(np.moveaxis(x.imag, axis, -1))

    @jax.jit
    def _apply(xr, xi, c, s):
        yr = xr @ c - xi @ s
        yi = xr @ s + xi @ c
        return yr, yi

    yr, yi = _apply(jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(cos), jnp.asarray(sin))
    out = np.asarray(yr) + 1j * np.asarray(yi)
    if inverse:
        out /= n
    return np.moveaxis(out, -1, axis)


def _fft_impl(x, axis: int, inverse: bool):
    import numpy as np

    if backend_platform() is None:
        # accelerator unreachable: host numpy keeps host-only prep alive
        op = np.fft.ifft if inverse else np.fft.fft
        return op(np.asarray(x), axis=axis)

    if has_device_fft():
        import jax.numpy as jnp

        op = jnp.fft.ifft if inverse else jnp.fft.fft
        return np.asarray(op(jnp.asarray(x), axis=axis))

    if np.asarray(x).shape[axis] <= _MATMUL_DFT_MAX:
        return _matmul_dft(x, axis, inverse)

    # very long transforms: host numpy (one-shot IO-scale work)
    op = np.fft.ifft if inverse else np.fft.fft
    return op(np.asarray(x), axis=axis)


def fft(x, axis=-1):
    """FFT on device: XLA's FFT on complex-capable backends, a
    split-complex matmul DFT on complex-free ones."""
    return _fft_impl(x, axis, inverse=False)


def ifft(x, axis=-1):
    return _fft_impl(x, axis, inverse=True)
