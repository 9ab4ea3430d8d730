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
def has_device_fft() -> bool:
    """True if the default backend implements FFT (complex-capable)."""
    env = os.environ.get("DRIFTSCAN_TPU_DEVICE_FFT")
    if env is not None:
        return env not in ("0", "false", "False")
    return jax.default_backend() in _COMPLEX_OK_PLATFORMS


def fft(x, axis=-1):
    """FFT on device if supported, else host numpy (timestream scale IO)."""
    import numpy as np

    if has_device_fft():
        import jax.numpy as jnp

        return np.asarray(jnp.fft.fft(jnp.asarray(x), axis=axis))
    return np.fft.fft(np.asarray(x), axis=axis)


def ifft(x, axis=-1):
    import numpy as np

    if has_device_fft():
        import jax.numpy as jnp

        return np.asarray(jnp.fft.ifft(jnp.asarray(x), axis=axis))
    return np.fft.ifft(np.asarray(x), axis=axis)
