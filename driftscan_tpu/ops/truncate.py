"""Precision truncation of transfer matrices for compressibility.

Equivalent of ``caput.truncate.bit_truncate_max_complex`` (a C/Cython
routine the reference applies before writing BTMs,
/root/reference/drift/core/beamtransfer.py:641-646): zero out mantissa
bits below a tolerance so the chunked-compressed HDF5 datasets shrink.

A native C++ implementation is loaded if built (see native/);
the numpy fallback rounds values onto a power-of-two grid chosen per
element, which has the same effect on compressibility.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_lib = None


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libdrifttrunc.so",
    )
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.bit_truncate_max_complex.argtypes = [
                ctypes.c_void_p,
                ctypes.c_long,
                ctypes.c_long,
                ctypes.c_double,
                ctypes.c_double,
            ]
            lib.bit_truncate_max_complex.restype = None
            _lib = lib
        except OSError:
            _lib = False
    else:
        _lib = False
    return _lib


def _round_to_grid(x: np.ndarray, tol: np.ndarray) -> np.ndarray:
    """Round x onto the power-of-two grid just below tol (elementwise)."""
    tol = np.maximum(tol, 1e-300)
    g = np.exp2(np.floor(np.log2(tol)))
    return np.round(x / g) * g


def bit_truncate_max_complex(
    arr: np.ndarray, rel: float, maxl: float
) -> np.ndarray:
    """Truncate a complex array in place.

    Parameters
    ----------
    arr : (n, k) complex128
        Modified in place.  Elements are rounded to the larger of
        ``rel * |x|`` (per element) and ``maxl * max_k |x|`` (per row).
    """
    if arr.size == 0:
        return arr
    assert arr.ndim == 2 and arr.dtype == np.complex128

    lib = _load_native()
    if lib:
        carr = np.ascontiguousarray(arr)
        lib.bit_truncate_max_complex(
            carr.ctypes.data, carr.shape[0], carr.shape[1], rel, maxl
        )
        if carr is not arr:
            arr[:] = carr
        return arr

    mag = np.abs(arr)
    rowmax = mag.max(axis=-1, keepdims=True)
    tol = np.maximum(rel * mag, maxl * rowmax)
    arr.real = _round_to_grid(arr.real, tol)
    arr.imag = _round_to_grid(arr.imag, tol)
    return arr
