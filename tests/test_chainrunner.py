"""Unit tests of the device-session chain runner (scratch/chainrunner.py).

The runner decides whether a chip session produces committed evidence;
these tests pin the semantics the shell chains got wrong (round-4
advisor finding): skip is not success, failure records are never
committed, the watchdog SIGINTs a stalled step, and the deadline stops
new work.  Steps are stubbed with tiny shell commands in a throwaway
git repo — no device, no network.
"""

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scratch"))

import chainrunner as cr


@pytest.fixture
def repo(tmp_path):
    subprocess.run(["git", "init", "-q", str(tmp_path)], check=True)
    subprocess.run(
        ["git", "-C", str(tmp_path), "config", "user.email", "t@t"],
        check=True,
    )
    subprocess.run(
        ["git", "-C", str(tmp_path), "config", "user.name", "t"], check=True
    )
    (tmp_path / "seed").write_text("x")
    subprocess.run(["git", "-C", str(tmp_path), "add", "."], check=True)
    subprocess.run(
        ["git", "-C", str(tmp_path), "commit", "-qm", "seed"], check=True
    )
    return tmp_path


def chain(repo, steps, **kw):
    kw.setdefault("log", lambda m: None)
    kw.setdefault("poll_s", 0.05)
    kw.setdefault("grace_s", 2.0)
    return cr.Chain(steps, repo=str(repo), **kw)


def subjects(repo):
    out = subprocess.run(
        ["git", "-C", str(repo), "log", "--format=%s"],
        capture_output=True, text=True, check=True,
    )
    return out.stdout.splitlines()


def write_record_step(repo, name="s1", msg="chain: s1", value=1.5,
                      extra=None, **kw):
    rec = repo / f"{name}.json"
    payload = {"value": value}
    payload.update(extra or {})
    return cr.Step(
        name=name,
        argv=[
            sys.executable, "-c",
            f"import json; json.dump({payload!r}, open({str(rec)!r}, 'w'))",
        ],
        commit_msg=msg,
        commit_paths=[str(rec)],
        **kw,
    )


def test_record_ok(tmp_path):
    p = tmp_path / "r.json"
    assert not cr.record_ok(str(p))  # missing
    p.write_text("not json")
    assert not cr.record_ok(str(p))
    p.write_text(json.dumps({"value": 0.0}))
    assert not cr.record_ok(str(p))  # bench fail-soft line
    p.write_text(json.dumps({"value": 3.2}))
    assert cr.record_ok(str(p))
    p.write_text(json.dumps({"value": 3.2, "failed": True}))
    assert not cr.record_ok(str(p))  # explicit failure marker
    p.write_text(json.dumps({"stages_ms": {}}))
    assert cr.record_ok(str(p))  # profile-style record, no value key


def test_success_commits(repo):
    c = chain(repo, [write_record_step(repo)])
    out = c.run()
    assert out == {"s1": cr.SUCCESS}
    assert "chain: s1" in subjects(repo)


def test_already_committed_skips_without_running(repo):
    step = write_record_step(repo)
    c = chain(repo, [step])
    c.run()
    marker = repo / "s1.json"
    marker.unlink()  # if the step reran it would recreate this
    out = chain(repo, [step]).run()
    assert out == {"s1": cr.SKIPPED_COMMITTED}
    assert not marker.exists()
    assert subjects(repo).count("chain: s1") == 1


def test_failure_record_never_committed(repo):
    """rc=0 but the record says failed -> no commit, outcome FAILED.
    This is the shell bug: a 0.0 bench record must not satisfy the gate."""
    step = write_record_step(
        repo, extra={"failed": True}, max_attempts=2
    )
    out = chain(repo, [step]).run()
    assert out == {"s1": cr.FAILED}
    assert "chain: s1" not in subjects(repo)


def test_zero_value_record_never_committed(repo):
    step = write_record_step(repo, value=0.0, max_attempts=1)
    out = chain(repo, [step]).run()
    assert out == {"s1": cr.FAILED}
    assert "chain: s1" not in subjects(repo)


def test_nonzero_exit_retries_then_failcap(repo, tmp_path):
    count = tmp_path / "count"
    step = cr.Step(
        name="flaky",
        argv=[
            sys.executable, "-c",
            (
                "import os, sys; p={!r}; "
                "n=int(open(p).read()) if os.path.exists(p) else 0; "
                "open(p,'w').write(str(n+1)); sys.exit(1)"
            ).format(str(count)),
        ],
        commit_msg="chain: flaky",
        commit_paths=[],
        max_attempts=2,
    )
    out = chain(repo, [step]).run()
    assert out == {"flaky": cr.FAILED}
    assert count.read_text() == "2"  # exactly max_attempts tries
    assert "chain: flaky" not in subjects(repo)


def test_deadline_skips_later_steps(repo):
    t = [0.0]

    def fake_time():
        return t[0]

    def fake_sleep(dt):
        t[0] += dt

    s1 = write_record_step(repo, "s1", "chain: d-s1")
    s2 = write_record_step(repo, "s2", "chain: d-s2")
    c = chain(
        repo, [s1, s2], end_time=-1.0, time_fn=fake_time, sleep_fn=fake_sleep
    )
    out = c.run()
    assert out == {
        "s1": cr.SKIPPED_DEADLINE,
        "s2": cr.SKIPPED_DEADLINE,
    }


def test_timeout_sigints_step(repo, tmp_path):
    mark = tmp_path / "sigint_seen"
    step = cr.Step(
        name="hang",
        # -S: skip sitecustomize (it imports jax, seconds of startup
        # during which an early SIGINT would beat the handler install)
        argv=[
            sys.executable, "-S", "-c",
            (
                "import signal, sys, time\n"
                "def h(sig, frm):\n"
                "    open({!r}, 'w').write('int')\n"
                "    sys.exit(3)\n"
                "signal.signal(signal.SIGINT, h)\n"
                "time.sleep(60)"
            ).format(str(mark)),
        ],
        commit_msg="chain: hang",
        commit_paths=[],
        timeout_s=2.0,
        max_attempts=1,
    )
    st = time.time()
    out = chain(repo, [step]).run()
    assert out == {"hang": cr.FAILED}
    assert mark.exists()  # SIGINT (not TERM/KILL) reached the child
    assert time.time() - st < 30


def test_stall_watchdog_fires_on_quiet_watch_paths(repo, tmp_path):
    watched = tmp_path / "progress"
    watched.write_text("0")
    step = cr.Step(
        name="stalled",
        argv=[sys.executable, "-c", "import time; time.sleep(60)"],
        commit_msg="chain: stalled",
        commit_paths=[],
        watch_paths=[str(watched)],
        stall_timeout_s=1.0,
        timeout_s=120.0,
        max_attempts=1,
    )
    st = time.time()
    out = chain(repo, [step]).run()
    assert out == {"stalled": cr.FAILED}
    assert time.time() - st < 30


def test_committed_gate_is_exact_subject_match(repo):
    (repo / "f").write_text("y")
    subprocess.run(["git", "-C", str(repo), "add", "."], check=True)
    subprocess.run(
        ["git", "-C", str(repo), "commit", "-qm", "chain: s1 extra"],
        check=True,
    )
    c = chain(repo, [])
    assert not c.committed("chain: s1")  # prefix of another subject
    assert c.committed("chain: s1 extra")
