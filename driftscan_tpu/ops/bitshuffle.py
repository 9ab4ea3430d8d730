"""Bitshuffle+LZ4 HDF5 compression (native plugin, LZF fallback).

The reference stores beam products with the bitshuffle+LZ4 codec
(/root/reference/drift/core/beamtransfer.py:26-32,549-555): after
mantissa truncation, bit-transposing the floats lines up the zeroed
mantissa bits into long runs that LZ4 collapses — much better ratios
than byte-shuffle+LZF.  Here the filter is implemented natively
(native/bshuf_lz4.cpp, standard filter id 32008, stream format per the
public bitshuffle spec) and registered with HDF5 as a dynamic plugin;
:func:`dataset_kwargs` returns the right ``create_dataset`` arguments
with automatic LZF fallback when the plugin is unavailable.
"""

from __future__ import annotations

import os

import numpy as np

BSHUF_FILTER = 32008
_BLOCK_ELEMS = 4096

_available = None
_registered = False


def register() -> bool:
    """Idempotently add the native dir to HDF5's plugin search path.

    Needed by any process that *reads* bitshuffle-compressed products,
    not only writers — call at import of the HDF5-consuming modules.
    """
    global _registered
    if _registered:
        return True
    so = os.path.join(_native_dir(), "libdriftbshuf.so")
    if not os.path.exists(so):
        return False
    try:
        import h5py

        h5py.h5pl.append(_native_dir().encode())
        _registered = True
    except Exception:
        return False
    return True


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _ensure_built() -> bool:
    so = os.path.join(_native_dir(), "libdriftbshuf.so")
    if os.path.exists(so):
        return True
    import subprocess

    try:
        subprocess.run(
            ["make", "libdriftbshuf.so"], cwd=_native_dir(), check=True,
            capture_output=True, timeout=120,
        )
    except Exception:
        return False
    return os.path.exists(so)


def available() -> bool:
    """True if the bitshuffle filter plugin loads and round-trips."""
    global _available
    if _available is not None:
        return _available
    if os.environ.get("DRIFTSCAN_TPU_BITSHUFFLE", "1") in ("0", "false"):
        _available = False
        return False
    _available = False
    try:
        if not _ensure_built():
            return False
        if not register():
            return False
        import h5py

        import tempfile

        data = (np.arange(4096, dtype=np.float64) * np.pi).reshape(64, 64)
        with tempfile.TemporaryDirectory() as d:
            fn = os.path.join(d, "probe.h5")
            with h5py.File(fn, "w") as f:
                f.create_dataset("x", data=data, **dataset_kwargs(data.dtype))
            with h5py.File(fn, "r") as f:
                ok = np.array_equal(f["x"][:], data)
        _available = bool(ok)
    except Exception:
        _available = False
    return _available


def dataset_kwargs(dtype, block: int = _BLOCK_ELEMS) -> dict:
    """``create_dataset`` kwargs for bitshuffle+LZ4 on ``dtype`` data.

    cd_values follow the standard bitshuffle filter convention:
    (major, minor, elem_size, block_size_elems, compressor=2 for LZ4).
    """
    elem = np.dtype(dtype).itemsize
    return {
        "compression": BSHUF_FILTER,
        "compression_opts": (0, 4, elem, block, 2),
    }


def compression_kwargs(dtype, codec: str = "bitshuffle") -> dict:
    """Dataset compression kwargs for the requested codec, with fallback.

    ``bitshuffle`` falls back to LZF+shuffle (the reference's own
    fallback path) when the native plugin is unavailable.
    """
    if codec == "bitshuffle" and available():
        return dataset_kwargs(dtype)
    if codec in ("bitshuffle", "lzf"):
        return {"compression": "lzf", "shuffle": True}
    if codec in (None, "none"):
        return {}
    raise ValueError(f"Unknown compression codec {codec!r}")
