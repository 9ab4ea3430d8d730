"""Decision-record adoption for the product CLI (engine_picks).

The bench and the CLI must run the same accuracy-gated on-chip picks
(doc/design.md adoption rule); these tests pin the resolver's contract:
env always wins, records only apply on an accelerator, missing records
keep library defaults.
"""

import json
import os

import pytest

from driftscan_tpu import engine_picks
from driftscan_tpu.ops import fpencil, sht


@pytest.fixture
def records(tmp_path):
    (tmp_path / "whiten_ab.json").write_text(json.dumps({"whiten_pick": "refined"}))
    (tmp_path / "exact_profile.json").write_text(
        json.dumps({"beam_factor_pick": "bcast"})
    )
    (tmp_path / "sht_ab.json").write_text(json.dumps({"sht_precision_pick": "high"}))
    return str(tmp_path)


@pytest.fixture
def restore_levers(monkeypatch):
    monkeypatch.setattr(fpencil, "_WHITEN_IMPL", fpencil._WHITEN_IMPL)
    monkeypatch.setattr(fpencil, "_BEAM_FACTOR_IMPL", fpencil._BEAM_FACTOR_IMPL)
    monkeypatch.setattr(sht, "_SHT_PRECISION", sht._SHT_PRECISION)


def test_cpu_adopts_nothing(records, restore_levers, monkeypatch):
    monkeypatch.setattr(
        "driftscan_tpu.backend.backend_platform", lambda: "cpu"
    )
    assert engine_picks.adopt_decision_records(records) == {}


def test_unreachable_device_adopts_nothing(records, restore_levers, monkeypatch):
    monkeypatch.setattr(
        "driftscan_tpu.backend.backend_platform", lambda: None
    )
    assert engine_picks.adopt_decision_records(records) == {}


def test_tpu_adopts_records(records, restore_levers, monkeypatch):
    monkeypatch.setattr(
        "driftscan_tpu.backend.backend_platform", lambda: "tpu"
    )
    for var in (
        "DRIFTSCAN_TPU_WHITEN_IMPL",
        "DRIFTSCAN_TPU_BEAM_FACTOR_IMPL",
        "DRIFTSCAN_TPU_SHT_PRECISION",
    ):
        monkeypatch.delenv(var, raising=False)
    adopted = engine_picks.adopt_decision_records(records)
    assert adopted == {
        "whiten": "refined",
        "beam_factor": "bcast",
        "sht_precision": "high",
    }
    assert fpencil._WHITEN_IMPL == "refined"
    assert fpencil._BEAM_FACTOR_IMPL == "bcast"
    assert sht._SHT_PRECISION == "high"


def test_env_always_wins(records, restore_levers, monkeypatch):
    monkeypatch.setattr(
        "driftscan_tpu.backend.backend_platform", lambda: "tpu"
    )
    monkeypatch.setenv("DRIFTSCAN_TPU_WHITEN_IMPL", "solve")
    monkeypatch.setenv("DRIFTSCAN_TPU_BEAM_FACTOR_IMPL", "einsum")
    monkeypatch.setenv("DRIFTSCAN_TPU_SHT_PRECISION", "highest")
    assert engine_picks.adopt_decision_records(records) == {}


def test_missing_records_keep_defaults(tmp_path, restore_levers, monkeypatch):
    monkeypatch.setattr(
        "driftscan_tpu.backend.backend_platform", lambda: "tpu"
    )
    before = (fpencil._WHITEN_IMPL, fpencil._BEAM_FACTOR_IMPL, sht._SHT_PRECISION)
    assert engine_picks.adopt_decision_records(str(tmp_path)) == {}
    assert (
        fpencil._WHITEN_IMPL,
        fpencil._BEAM_FACTOR_IMPL,
        sht._SHT_PRECISION,
    ) == before
