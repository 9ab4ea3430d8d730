#!/usr/bin/env python
"""Round-5 second-session chain: finish what chain_r5 banked.

The first round-5 session completed probe_regate, bench_rehearsal
(21.5x, doc/bench_rehearsal.json), topband_chip, ns2_overrides, and
6/7 ns2 windows before the container swapped (/tmp + untracked files
wiped, compile cache cold).  This chain resumes:

1. ns2  — restores 6 committed window checkpoints, computes window 7,
          writes the COMPLETE doc/northstar2_run.json (VERDICT r4 #1).
2. ns1b — scale axis (mmax 1032, 2x4 feeds): bank 2 windows with real
          retained-mode physics (VERDICT r4 #7).
3. bench_final — full bench on the adopted picks; doubles as the
          compile-cache warmer for the driver's round-end BENCH_r05
          (VERDICT r4 #2/#3).
4. cli_tpu — CLI pipeline refresh (VERDICT r4 #5), if time remains.

Usage:  python scratch/chain_r5b.py [end_hour_utc HHMM]
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
    end = at_utc(sys.argv[1] if len(sys.argv) > 1 else "1500")
    now = time.time()
    steps = [
        Step(
            name="ns2_finish",
            argv=[PY, f"{REPO}/scratch/northstar2.py"],
            env={"NS2_DEADLINE": f"{min(now + 3300, end):.0f}"},
            commit_msg="chain-r5: ns2 full 7-window flagship record",
            record_path=f"{REPO}/doc/northstar2_run.json",
            commit_paths=[
                f"{REPO}/doc/northstar2_run.json",
                f"{REPO}/doc/northstar2_fisher.npz",
                f"{REPO}/ckpt/ns2_windows",
            ],
            watch_paths=[f"{REPO}/ckpt/ns2_windows"],
            log_path="/tmp/northstar2_run.log",
            stall_timeout_s=2100,
            timeout_s=3900,
            max_attempts=2,
        ),
        Step(
            name="ns1b",
            argv=[PY, f"{REPO}/scratch/northstar2.py"],
            env={
                "NS2_PRESET": "ns1b",
                "NS2_MAX_WINDOWS": "2",
                "NS2_DEADLINE": f"{end - 1500:.0f}",
            },
            commit_msg="chain-r5: ns1b scale-axis windows (mmax 1032)",
            record_path=f"{REPO}/doc/northstar1b_run.json",
            commit_paths=[
                f"{REPO}/doc/northstar1b_run.json",
                f"{REPO}/doc/northstar1b_fisher.npz",
                f"{REPO}/ckpt/ns1b_windows",
            ],
            watch_paths=[f"{REPO}/ckpt/ns1b_windows"],
            log_path="/tmp/ns1b_run.log",
            stall_timeout_s=2100,
            timeout_s=3600,
            max_attempts=1,
        ),
        Step(
            name="bench_final",
            argv=[PY, f"{REPO}/bench.py"],
            env={"BENCH_RECORD_PATH": f"{REPO}/doc/bench_final_r5.json"},
            commit_msg="chain-r5: final bench on adopted picks (cache warm)",
            commit_paths=[f"{REPO}/doc/bench_final_r5.json"],
            log_path="/tmp/bench_final_r5.log",
            stall_timeout_s=1800,
            timeout_s=2700,
            max_attempts=1,
        ),
        Step(
            name="cli_tpu",
            argv=[PY, f"{REPO}/scratch/cli_tpu.py"],
            commit_msg="chain-r5: CLI pipeline refresh",
            commit_paths=[f"{REPO}/doc/cli_tpu.json"],
            log_path="/tmp/cli_tpu_r5.log",
            stall_timeout_s=1500,
            timeout_s=2400,
            max_attempts=1,
        ),
    ]
    for st in steps:
        if st.log_path is None:
            st.log_path = f"/tmp/chain_r5b_{st.name}.log"
    chain = Chain(steps, end_time=end, repo=REPO)
    out = chain.run()
    print(out)


if __name__ == "__main__":
    main()
