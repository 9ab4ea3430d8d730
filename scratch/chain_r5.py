#!/usr/bin/env python
"""Round-5 device chain — the 5-line-invoker successor of the shell chains.

Order (VERDICT r4 priorities): the pick-unlock probe first (smallest,
unblocks sig1 adoption), the full bench rehearsal second (headline
evidence + warms the compile cache the driver's round-end bench will
hit), then the topband chip forensic, the override decision, the ns2
7-window flagship, the CLI refresh, and the ns1b scale-axis windows.

Every step is its own TPU client under the one-client pidfile protocol;
the runner SIGINTs a stalled/overtime step and never commits a failure
record (scratch/chainrunner.py, tests/test_chainrunner.py).

Usage:  python scratch/chain_r5.py [end_hour_utc]
"""

import datetime
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chainrunner import Chain, Step

REPO = "/root/repo"
PY = sys.executable


def at_utc(hhmm: str) -> float:
    now = datetime.datetime.now(datetime.timezone.utc)
    h, m = int(hhmm[:2]), int(hhmm[2:])
    t = now.replace(hour=h, minute=m, second=0, microsecond=0)
    if t < now:
        t += datetime.timedelta(days=1)
    return t.timestamp()


def main():
    end = at_utc(sys.argv[1] if len(sys.argv) > 1 else "1630")
    ns2_deadline = min(end - 3600, time.time() + 6 * 3600)
    steps = [
        Step(
            # re-runs the (now fixed) fused-Fisher gate FIRST: the 08:00
            # pass was vacuous (adaptive reference == candidate;
            # _fisher_batch cache not cleared around the qr patch).
            # Running it before the rehearsal means the rehearsal and
            # its warm compile cache ride the adopted picks.
            name="probe_regate",
            argv=[PY, f"{REPO}/scratch/probe_mb113.py"],
            commit_msg="chain-r5: fused-Fisher gate (fixed reference)",
            commit_paths=[f"{REPO}/doc/exact_profile.json"],
            timeout_s=2400,
        ),
        Step(
            name="bench_rehearsal",
            argv=[PY, f"{REPO}/bench.py"],
            env={"BENCH_RECORD_PATH": f"{REPO}/doc/bench_rehearsal.json"},
            commit_msg="chain-r5: bench rehearsal (adopted picks)",
            commit_paths=[f"{REPO}/doc/bench_rehearsal.json"],
            log_path="/tmp/bench_rehearsal_r5.log",
            stall_timeout_s=2400,
            timeout_s=5400,
        ),
        Step(
            name="topband_chip",
            argv=[PY, f"{REPO}/scratch/topband_forensic.py"],
            env={"TB_CHIP": "1"},
            commit_msg="chain-r5: topband forensic chip",
            commit_paths=[f"{REPO}/doc/topband_forensic_chip.json"],
            timeout_s=3600,
        ),
        Step(
            name="ns2_overrides",
            argv=[PY, f"{REPO}/scratch/write_ns2_overrides.py"],
            commit_msg="chain-r5: ns2 engine override decision",
            commit_paths=[f"{REPO}/doc/ns2_overrides.json"],
            timeout_s=120,
        ),
        Step(
            name="ns2",
            argv=[PY, f"{REPO}/scratch/northstar2.py"],
            env={"NS2_DEADLINE": f"{ns2_deadline:.0f}"},
            commit_msg="chain-r5: ns2 full 7-window flagship record",
            record_path=f"{REPO}/doc/northstar2_run.json",
            commit_paths=[
                f"{REPO}/doc/northstar2_run.json",
                f"{REPO}/doc/northstar2_fisher.npz",
                f"{REPO}/ckpt/ns2_windows",
            ],
            watch_paths=[f"{REPO}/ckpt/ns2_windows"],
            log_path="/tmp/northstar2_run.log",
            stall_timeout_s=3600,
            timeout_s=4.5 * 3600,
            # window checkpoints self-commit; a deadline-partial record
            # is judged and committed by hand, not auto-retried forever
            max_attempts=2,
        ),
        Step(
            name="cli_tpu",
            argv=[PY, f"{REPO}/scratch/cli_tpu.py"],
            commit_msg="chain-r5: CLI pipeline refresh",
            commit_paths=[f"{REPO}/doc/cli_tpu.json"],
            log_path="/tmp/cli_tpu_r5.log",
            stall_timeout_s=2700,
            timeout_s=5400,
        ),
        Step(
            name="ns1b",
            argv=[PY, f"{REPO}/scratch/northstar2.py"],
            env={"NS2_PRESET": "ns1b", "NS2_MAX_WINDOWS": "3"},
            commit_msg="chain-r5: ns1b scale-axis windows (mmax 1032)",
            record_path=f"{REPO}/doc/northstar1b_run.json",
            commit_paths=[
                f"{REPO}/doc/northstar1b_run.json",
                f"{REPO}/doc/northstar1b_fisher.npz",
                f"{REPO}/ckpt/ns1b_windows",
            ],
            watch_paths=[f"{REPO}/ckpt/ns1b_windows"],
            log_path="/tmp/ns1b_run.log",
            stall_timeout_s=3600,
            timeout_s=2.5 * 3600,
        ),
    ]
    # per-step logs for the short steps too
    for st in steps:
        if st.log_path is None:
            st.log_path = f"/tmp/chain_r5_{st.name}.log"
    chain = Chain(steps, end_time=end, repo=REPO)
    out = chain.run()
    print(out)


if __name__ == "__main__":
    main()
