"""Adopt on-chip A/B decision records as engine defaults.

The repo's adoption rule (doc/design.md §7): every perf lever ships
behind a switch whose default flips only on an accuracy-gated on-chip
A/B, recorded as a small JSON decision file under ``doc/``.  The bench
has always read those records; this module makes the *product* CLI
(``drift-makeproducts`` / ``drift-runpipeline``) ride the identical
picks, so the measured configuration is the shipped configuration.

Resolution order for every lever: explicit env var > decision record >
library default.  A missing/garbled record (the normal state on a fresh
deployment) silently keeps the library default — records are evidence,
never a requirement.

Records consumed
----------------
``whiten_ab.json``      -> ``fpencil._WHITEN_IMPL`` (whitening application)
``exact_profile.json``  -> ``fpencil._BEAM_FACTOR_IMPL`` (einsum vs bcast)
``sht_ab.json``         -> ``sht._SHT_PRECISION`` (matmul tier)
``topband_ab.json``     -> ``fpencil._FILTER_PRECISION`` (Chebyshev filter)

The top-band *engine* choice itself is per-run configuration
(``KLTransform.engine`` in the YAML, reference kltransform.py:310-355
semantics) — a decision record must not override a user's config.
"""

from __future__ import annotations

import json
import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "doc")


def _read(path: str, key: str):
    try:
        with open(path) as f:
            return json.load(f).get(key)
    except (OSError, ValueError):
        return None


def adopt_decision_records(
    directory: str | None = None, require_accelerator: bool = True
) -> dict:
    """Apply every recorded accuracy-gated pick whose env var is unset.

    ``directory`` defaults to ``$DRIFTSCAN_TPU_DECISION_DIR``, else the
    repo-local ``doc/``.  Returns {lever: adopted value} for logging.

    ``require_accelerator=False`` adopts regardless of platform — the
    bench uses it so a CPU-pinned flow test exercises the exact
    configuration the chip run will ship.
    """
    d = directory or os.environ.get("DRIFTSCAN_TPU_DECISION_DIR", _DEFAULT_DIR)
    adopted = {}

    # The records are *TPU* measurements (accuracy gates included): on a
    # CPU/host-only run the library defaults are already the right
    # numerics, so adopt nothing.  backend_platform() is the fail-soft
    # probe — an unreachable accelerator reads as "not tpu" rather than
    # crashing host-side product prep (doc/design.md, fail-soft rule).
    if require_accelerator:
        from . import backend

        platform = backend.backend_platform()
        if platform is None or platform == "cpu":
            return adopted

    if os.environ.get("DRIFTSCAN_TPU_WHITEN_IMPL") is None:
        wp = _read(os.path.join(d, "whiten_ab.json"), "whiten_pick")
        if wp:
            from .ops import fpencil

            fpencil._WHITEN_IMPL = wp
            adopted["whiten"] = wp

    if os.environ.get("DRIFTSCAN_TPU_BEAM_FACTOR_IMPL") is None:
        bf = _read(os.path.join(d, "exact_profile.json"), "beam_factor_pick")
        if bf:
            from .ops import fpencil

            fpencil._BEAM_FACTOR_IMPL = bf
            adopted["beam_factor"] = bf

    if os.environ.get("DRIFTSCAN_TPU_SHT_PRECISION") is None:
        sp = _read(os.path.join(d, "sht_ab.json"), "sht_precision_pick")
        if sp:
            from .ops import sht

            sht._SHT_PRECISION = sp
            adopted["sht_precision"] = sp

    if os.environ.get("DRIFTSCAN_TPU_TOPBAND_FILTER_PRECISION") is None:
        fp = _read(os.path.join(d, "topband_ab.json"), "filter_precision_pick")
        if fp:
            from .ops import fpencil

            fpencil._FILTER_PRECISION = fp
            adopted["filter_precision"] = fp

    return adopted
