#!/usr/bin/env python
"""Decide the ns2 engine override from the chip topband forensic.

Rule (doc/ROUND4_STATE.md, VERDICT r4 item 4): if the k2x variant
(starting subspace n/4) passes on chip — certificates ok, retained sets
equal, paired value rel <= 1e-3 — write doc/ns2_overrides.json with
{"topband": true, "tb_start_frac": 4} so the production-shaped run's
ndof=3200 eigh rides the matmul-only top-band engine.  Otherwise the
record says topband stays off and why.  Pure host step, no device.
"""

import json

REC = "/root/repo/doc/topband_forensic_chip.json"
OUT = "/root/repo/doc/ns2_overrides.json"


def main():
    try:
        with open(REC) as f:
            rec = json.load(f)
    except (OSError, ValueError) as exc:
        out = {
            "topband": False,
            "reason": f"no usable chip forensic record ({exc!r:.120})",
        }
    else:
        k2x = rec.get("k2x", {})
        ok = bool(
            k2x.get("ok_all")
            and k2x.get("sets_equal")
            and k2x.get("paired_rel_max", 1.0) <= 1e-3
        )
        out = {
            "topband": ok,
            "tb_start_frac": 4,
            "gate": {
                "ok_all": k2x.get("ok_all"),
                "sets_equal": k2x.get("sets_equal"),
                "paired_rel_max": k2x.get("paired_rel_max"),
            },
        }
        if not ok:
            out["reason"] = "chip k2x failed the accuracy gate; engine stays exact"
    with open(OUT + ".tmp", "w") as f:
        json.dump(out, f, indent=1)
    import os

    os.replace(OUT + ".tmp", OUT)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
