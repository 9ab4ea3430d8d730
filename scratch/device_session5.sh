#!/bin/bash
# Round-3 post-northstar device chain:
#   1. whiten A/B            -> doc/whiten_ab.json (solve vs refined pick)
#   2. exact-engine profiler -> doc/exact_profile.json refresh (new probes:
#                               compacted signal factor, triple SVD, r4 QR)
#   3. bench rehearsal       -> doc/bench_rehearsal.json with adopted picks
# Steps wait politely while the north-star run (or the driver's bench)
# holds the TPU pidfile; each is gated on a done-marker so a restarted
# chain never repeats finished work.
cd /root/repo

held() {
    [ -f /tmp/tpu_client.pid ] || return 1
    local pid
    pid=$(cut -d' ' -f1 /tmp/tpu_client.pid 2>/dev/null)
    { [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; } || return 1
    grep -qa "python" "/proc/$pid/cmdline" 2>/dev/null || return 1
    return 0
}

yield_if_held() {
    if held; then
        echo "[chain5] device held by pid $(cut -d' ' -f1 /tmp/tpu_client.pid); waiting $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 120
        return 0
    fi
    return 1
}

step() {  # step <name> <donefile> <cmd...>
    local name="$1" done="$2"; shift 2
    [ -f "$done" ] && return 0
    if yield_if_held; then return 1; fi
    echo "[chain5] $name... $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    if "$@" > "/tmp/${name}.log" 2>&1; then
        [ -f "$done" ] || touch "$done"
        echo "[chain5] $name DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        return 0
    fi
    echo "[chain5] $name failed; relooping" >> /tmp/device_session.log
    sleep 60
    return 1
}

while true; do
    if yield_if_held; then continue; fi
    if ! python scratch/tpu_preflight.py >> /tmp/device_session.log 2>&1; then
        echo "[chain5] preflight no device $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 180
        continue
    fi
    step whiten_ab /root/repo/doc/whiten_ab.json \
        python scratch/whiten_ab.py || continue
    step exact_profile_r3 /tmp/exact_profile_r3.done \
        python scratch/exact_profile.py || continue
    step bench_rehearsal_r3 /tmp/bench_rehearsal_r3.done \
        python bench.py || continue
    if [ -f /tmp/bench_rehearsal_r3.done ] && [ ! -f doc/bench_rehearsal.json.r3 ]; then
        tail -1 /tmp/bench_rehearsal_r3.log > doc/bench_rehearsal.json
        cp doc/bench_rehearsal.json doc/bench_rehearsal.json.r3
    fi
    # flagship north-star run last (hours; window-checkpointed, so a
    # relaunch after a crash resumes).  Runs only if its record is
    # missing — the normal path is that the original launch finishes
    # and this step never fires.
    if [ ! -f /root/repo/doc/northstar_run.json ]; then
        if yield_if_held; then continue; fi
        echo "[chain5] northstar relaunch... $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        # pin the QR impl the first three windows were computed with
        # (checkpoint tags don't carry it; keep the flagship run
        # internally consistent — next round's fresh run gets the
        # more-accurate cholqr_split default)
        DRIFTSCAN_TPU_QR_IMPL=cholqr python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
            || { echo "[chain5] northstar failed; relooping" >> /tmp/device_session.log; sleep 120; continue; }
        echo "[chain5] northstar DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    fi
    echo "[chain5] ALL DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    exit 0
done
