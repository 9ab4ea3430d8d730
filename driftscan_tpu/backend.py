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


@lru_cache(maxsize=1)
def split_complex() -> bool:
    """True if the hot paths should use the split-complex implementation."""
    env = os.environ.get("DRIFTSCAN_TPU_SPLIT_COMPLEX")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() not in _COMPLEX_OK_PLATFORMS


@lru_cache(maxsize=1)
def device_f32_only() -> bool:
    """True if device math should be forced to f32 planes.

    On runtimes that emulate f64 as a float32 pair, fused f64 programs
    compile pathologically (minutes-to-never) and run no more accurately
    than the chip's native f32; the dispatchers therefore downcast device
    operands to f32 on such backends (override with
    ``DRIFTSCAN_TPU_DEVICE_F64=1`` to experiment).
    """
    env = os.environ.get("DRIFTSCAN_TPU_DEVICE_F64")
    if env is not None:
        return env in ("0", "false", "False")
    return split_complex()


def device_real(x):
    """Contiguous real array with the device compute dtype applied."""
    import numpy as np

    x = np.ascontiguousarray(x)
    if device_f32_only() and x.dtype == np.float64:
        return x.astype(np.float32)
    return x


@lru_cache(maxsize=1)
def has_device_fft() -> bool:
    """True if the default backend implements FFT (complex-capable)."""
    env = os.environ.get("DRIFTSCAN_TPU_DEVICE_FFT")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() in _COMPLEX_OK_PLATFORMS


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
