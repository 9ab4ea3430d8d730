"""Device-session chain runner: the tested successor of device_session*.sh.

Ten shell revisions (scratch/device_session.sh .. device_session10.sh)
accreted the operational rules that decide whether a chip session
produces committed evidence: SIGINT-only kills, a stall watchdog, a
launch-relative hard deadline, committed-record gating, per-step
failure caps, and single-client discipline.  This module encodes those
rules as a small, unit-tested library (tests/test_chainrunner.py) so
the next tunnel wedge costs minutes of debugging, not a session.  The
shell's job shrinks to a 5-line invoker building a Chain and calling
``run()``.

Semantics fixed relative to the shell (round-4 advisor finding):

* a SKIPPED step (already committed, past deadline, or fail-capped) is
  a distinct outcome from SUCCESS, and only SUCCESS commits its record;
* a record file carrying ``"failed": true`` or ``"value": 0`` is never
  committed — the bench's fail-soft line cannot permanently satisfy a
  gate (the shell committed a twice-failed bench's 0.0 record under the
  success gate message, defeating the retry canary).

Kill ladder (doc/design.md section 13 forensics): SIGINT first — the
one signal a live axon client survives cleanly (it releases the device
claim); escalation to SIGTERM only after ``grace_s`` of no exit, for
clients already wedged past caring.  Never SIGKILL (wedges the claim
20-65 min), never pkill/pgrep by pattern.
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import subprocess
import time
from typing import Callable, Optional, Sequence

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def record_ok(path: str) -> bool:
    """True iff ``path`` holds a committable JSON record.

    Not committable: unreadable/garbage JSON, ``"failed": true``, or a
    bench-style record whose ``value`` is 0/None (the fail-soft line).
    Records without a ``value`` key (profiles, forensics) pass on
    parseability alone.
    """
    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return False
    if not isinstance(rec, dict):
        return False
    if rec.get("failed"):
        return False
    if "value" in rec and not rec["value"]:
        return False
    return True


@dataclasses.dataclass
class Step:
    """One chain step: a subprocess producing a committable record."""

    name: str
    argv: Sequence[str]
    commit_msg: str
    # files/dirs to commit on success; the first entry is the record
    # gated by record_ok unless ``record_path`` overrides it
    commit_paths: Sequence[str] = ()
    record_path: Optional[str] = None
    timeout_s: float = 3600.0
    # SIGINT the step when none of its watch_paths (default: the record
    # and commit paths) changes for this long; 0 disables the watchdog
    stall_timeout_s: float = 0.0
    watch_paths: Sequence[str] = ()
    # step stdout+stderr appended here (and auto-watched: progress
    # prints reset the stall watchdog); None inherits the chain's stdio
    log_path: Optional[str] = None
    env: Optional[dict] = None
    max_attempts: int = 2

    def record(self) -> Optional[str]:
        if self.record_path:
            return self.record_path
        return self.commit_paths[0] if self.commit_paths else None


# step outcomes
SUCCESS = "success"
SKIPPED_COMMITTED = "skipped:committed"
SKIPPED_DEADLINE = "skipped:deadline"
SKIPPED_FAILCAP = "skipped:failcap"
FAILED = "failed"


class Chain:
    """Run steps in order against a launch-relative deadline."""

    def __init__(
        self,
        steps: Sequence[Step],
        end_time: Optional[float] = None,
        repo: str = REPO,
        log: Callable[[str], None] = None,
        time_fn: Callable[[], float] = time.time,
        sleep_fn: Callable[[float], None] = time.sleep,
        popen_fn=subprocess.Popen,
        grace_s: float = 120.0,
        poll_s: float = 5.0,
    ):
        self.steps = list(steps)
        self.end_time = end_time
        self.repo = repo
        self.log = log or (lambda m: print(f"[chain] {m}", flush=True))
        self.time = time_fn
        self.sleep = sleep_fn
        self.popen = popen_fn
        self.grace_s = grace_s
        self.poll_s = poll_s
        self.outcomes: dict[str, str] = {}

    # -- git helpers ------------------------------------------------

    def _git(self, *args, check=False):
        res = subprocess.run(
            ["git", "-C", self.repo, *args], capture_output=True, text=True
        )
        if check and res.returncode:
            raise RuntimeError(f"git {args} failed: {res.stderr[:300]}")
        return res

    def committed(self, msg: str) -> bool:
        """True iff a commit with exactly this subject line exists."""
        res = self._git(
            "log", "--fixed-strings", "--grep", msg, "--format=%s"
        )
        return any(line == msg for line in res.stdout.splitlines())

    def commit(self, step: Step) -> bool:
        rec = step.record()
        if rec and not record_ok(rec):
            self.log(
                f"{step.name}: record {rec} not committable "
                f"(missing/failed/zero) — NOT committing"
            )
            return False
        for attempt in range(3):
            add = self._git("add", "--", *step.commit_paths)
            if add.returncode == 0:
                cm = self._git(
                    "commit", "-q", "-m", step.commit_msg, "--",
                    *step.commit_paths,
                )
                if cm.returncode == 0:
                    return True
                err = cm.stderr + cm.stdout
            else:
                err = add.stderr
            self.sleep(5.0)
        self.log(f"{step.name}: commit failed ({err[:200]})")
        return False

    # -- process control --------------------------------------------

    def _watch_mtimes(self, step: Step):
        paths = list(step.watch_paths) or list(step.commit_paths)
        rec = step.record()
        if rec and rec not in paths:
            paths.append(rec)
        if step.log_path and step.log_path not in paths:
            paths.append(step.log_path)
        out = {}
        for p in paths:
            try:
                if os.path.isdir(p):
                    out[p] = max(
                        (e.stat().st_mtime for e in os.scandir(p)),
                        default=os.stat(p).st_mtime,
                    )
                else:
                    out[p] = os.stat(p).st_mtime
            except OSError:
                out[p] = None
        return out

    def _terminate(self, proc, why: str):
        """SIGINT, then SIGTERM after grace_s.  Never SIGKILL (a killed
        axon client wedges the device claim for 20-65 min)."""
        self.log(f"terminating step ({why}): SIGINT pid {proc.pid}")
        try:
            proc.send_signal(signal.SIGINT)
        except ProcessLookupError:
            return
        deadline = self.time() + self.grace_s
        while self.time() < deadline:
            if proc.poll() is not None:
                return
            self.sleep(self.poll_s)
        self.log(f"no exit after SIGINT; SIGTERM pid {proc.pid}")
        try:
            proc.terminate()
        except ProcessLookupError:
            pass
        # bounded reap so a zombie never hangs the chain
        deadline = self.time() + self.grace_s
        while self.time() < deadline and proc.poll() is None:
            self.sleep(self.poll_s)

    def run_step(self, step: Step) -> bool:
        """One attempt.  True iff the process exited 0 in time."""
        env = dict(os.environ)
        if step.env:
            env.update(step.env)
        self.log(f"{step.name}: launching {' '.join(step.argv)}")
        kw = {}
        logf = None
        if step.log_path:
            logf = open(step.log_path, "ab", buffering=0)
            kw = dict(stdout=logf, stderr=subprocess.STDOUT)
        try:
            proc = self.popen(step.argv, env=env, **kw)
        finally:
            if logf is not None:
                logf.close()
        start = self.time()
        last_change = start
        mtimes = self._watch_mtimes(step)
        while proc.poll() is None:
            now = self.time()
            if now - start > step.timeout_s:
                self._terminate(proc, f"timeout {step.timeout_s:.0f}s")
                return False
            if self.end_time and now > self.end_time + self.grace_s:
                self._terminate(proc, "past chain end")
                return False
            if step.stall_timeout_s:
                cur = self._watch_mtimes(step)
                if cur != mtimes:
                    mtimes, last_change = cur, now
                elif now - last_change > step.stall_timeout_s:
                    self._terminate(
                        proc, f"stalled {step.stall_timeout_s:.0f}s"
                    )
                    return False
            self.sleep(self.poll_s)
        rc = proc.returncode
        self.log(f"{step.name}: exited rc={rc} after {self.time()-start:.0f}s")
        return rc == 0

    def run(self) -> dict:
        for step in self.steps:
            if self.committed(step.commit_msg):
                self.log(f"{step.name}: already committed; skip")
                self.outcomes[step.name] = SKIPPED_COMMITTED
                continue
            if self.end_time and self.time() > self.end_time:
                self.log(f"{step.name}: past chain end; skip")
                self.outcomes[step.name] = SKIPPED_DEADLINE
                continue
            outcome = SKIPPED_FAILCAP
            for attempt in range(1, step.max_attempts + 1):
                if self.end_time and self.time() > self.end_time:
                    outcome = SKIPPED_DEADLINE
                    break
                if self.run_step(step):
                    rec = step.record()
                    if rec is None or record_ok(rec):
                        outcome = SUCCESS
                    else:
                        self.log(
                            f"{step.name}: rc=0 but record not ok "
                            f"(attempt {attempt})"
                        )
                        outcome = FAILED
                        continue
                    break
                outcome = FAILED
                self.log(f"{step.name}: attempt {attempt} failed")
            self.outcomes[step.name] = outcome
            # ONLY a real success commits (the shell committed on the
            # skip path too, gate-committing failure records)
            if outcome == SUCCESS and step.commit_paths:
                self.commit(step)
        self.log(f"chain done: {self.outcomes}")
        return self.outcomes
