"""Pin the round-5 product-pick adoption contract (scratch/exact_profile._picks).

The headline's {mbatch, sig_levels, cholqr_rounds} combo is decided by a
pure function of the profiler record; these tests pin the rules that
chose the round-5 picks so a future record edit cannot silently change
the contract:

* only measured combinations compete, each accuracy-gated (retained
  sets equal + rel <= 1e-3) on the mb=8 sig2 reference;
* non-default sig/qr combos additionally need the fused-Fisher
  eigenvector gate (fisher_combo_ok) — the spectrum gate cannot see
  eigenvector quality;
* candidates are ranked at the PHASE-EFFECTIVE per-m (padding-waste
  corrected): mb=113 tiles nm=226 exactly, so it beats a raw-faster
  mb=128 that wastes 13% of its last batch.
"""

import os
import sys

os.environ.setdefault("AB_CPU", "1")  # never register as the TPU client
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scratch"))

import exact_profile


def _base_rec(**over):
    """Minimal record shaped like the round-5 chip profile."""
    rec = {
        "mb": 8,
        "nm": 226,
        "batch_ms_sig2": 2096.0,
        "batch_ms_default_prec": 2177.0,
        "default_prec_rel": 0.943,
        "default_prec_sets_equal": False,
        "batch128_sig2_ms": 16360.0,
        "batch128_sig2_per_m_ms": 127.8,
        "batch128_sig2_rel": 0.000276,
        "batch128_sig2_sets_equal": True,
        "batch128_sig1_ms": 13182.0,
        "batch128_sig1_per_m_ms": 103.0,
        "batch128_sig1_rel": 0.000276,
        "batch128_sig1_sets_equal": True,
        "batch113_sig1_ms": 12158.0,
        "batch113_sig1_per_m_ms": 107.6,
        "batch113_sig1_rel": 3.0e-4,
        "batch113_sig1_sets_equal": True,
        "batch113_sig1_qr4_ms": 11899.0,
        "batch113_sig1_qr4_per_m_ms": 105.3,
        "batch113_sig1_qr4_rel": 1.13e-3,  # past the 1e-3 spectrum gate
        "batch113_sig1_qr4_sets_equal": True,
        "mb128": 128,
        "mb113": 113,
        "fisher_combo_ok": True,
        "stages_ms": {},
    }
    rec.update(over)
    return rec


def test_round5_pick_is_mb113_sig1_default_qr():
    out = exact_profile._picks(_base_rec())
    assert out["product_pick"] == {
        "mbatch": 113, "sig_levels": 1, "cholqr_rounds": 0,
    }


def test_qr4_stays_out_past_the_spectrum_gate():
    # even with the fused-Fisher gate green, a qr4 combo whose spectrum
    # rel exceeds 1e-3 must not be adopted
    out = exact_profile._picks(_base_rec())
    assert out["product_pick"]["cholqr_rounds"] == 0
    # ... unless it actually passes the gate, in which case its better
    # effective per-m wins
    out2 = exact_profile._picks(_base_rec(batch113_sig1_qr4_rel=9.0e-4))
    assert out2["product_pick"] == {
        "mbatch": 113, "sig_levels": 1, "cholqr_rounds": 4,
    }


def test_sig1_needs_the_fused_fisher_gate():
    # gate red: every sig1 candidate is excluded and the pick falls back
    # to the deepest gated sig2 combination
    out = exact_profile._picks(_base_rec(fisher_combo_ok=False))
    assert out["product_pick"] == {
        "mbatch": 128, "sig_levels": 2, "cholqr_rounds": 0,
    }


def test_phase_effective_ranking_prefers_exact_tiling():
    # raw per-m: mb128 sig1 (103.0) < mb113 sig1 (107.6); but over
    # nm=226, mb=128 pads 2x128=256 slots (13% waste) -> effective
    # 116.7 loses to mb113's exact 2x113 tiling
    out = exact_profile._picks(_base_rec())
    assert out["product_pick"]["mbatch"] == 113
    # at an nm that 128 tiles exactly and 113 does not, 128 wins
    out2 = exact_profile._picks(_base_rec(nm=256))
    assert out2["product_pick"]["mbatch"] == 128
