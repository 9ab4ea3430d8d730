#!/bin/bash
# Round-3 session-6 device chain (fresh container: /tmp and every
# untracked file were wiped, so the three completed north-star windows
# and both host caches are gone — only the git tree survives).
#   1. whiten A/B          -> doc/whiten_ab.json (solve vs refined pick;
#                             quick, gates a product-phase lever the
#                             north-star run then adopts)
#   2. north-star run      -> doc/northstar_run.json; window checkpoints
#                             now live in git-tracked ckpt/ns_windows and
#                             the script commits each one as it lands
#   3. bench rehearsal     -> doc/bench_rehearsal.json refresh under the
#                             final adopted picks
# Steps wait politely while another client holds the TPU pidfile; each
# is gated on its output record so a restarted chain never repeats
# finished work.
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
        echo "[chain6] device held by pid $(cut -d' ' -f1 /tmp/tpu_client.pid); waiting $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 120
        return 0
    fi
    return 1
}

step() {  # step <name> <donefile> <cmd...>
    local name="$1" done="$2"; shift 2
    [ -f "$done" ] && return 0
    if yield_if_held; then return 1; fi
    echo "[chain6] $name... $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    if "$@" > "/tmp/${name}.log" 2>&1; then
        [ -f "$done" ] || touch "$done"
        echo "[chain6] $name DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        return 0
    fi
    echo "[chain6] $name failed; relooping" >> /tmp/device_session.log
    sleep 60
    return 1
}

while true; do
    if yield_if_held; then continue; fi
    if ! python scratch/tpu_preflight.py >> /tmp/device_session.log 2>&1; then
        echo "[chain6] preflight no device $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 180
        continue
    fi
    step whiten_ab /root/repo/doc/whiten_ab.json \
        python scratch/whiten_ab.py || continue
    # flagship north-star run: hours, but window-checkpointed into git —
    # a container swap mid-run resumes from the last committed window.
    # Fresh checkpoints (the /tmp ones are lost), so the run uses the
    # current defaults (cholqr_split QR) plus the gated picks above.
    if [ ! -f /root/repo/doc/northstar_run.json ]; then
        if yield_if_held; then continue; fi
        echo "[chain6] northstar... $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
            || { echo "[chain6] northstar failed; relooping" >> /tmp/device_session.log; sleep 120; continue; }
        echo "[chain6] northstar DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    fi
    step bench_rehearsal_r3b /tmp/bench_rehearsal_r3b.done \
        python bench.py || continue
    if [ -f /tmp/bench_rehearsal_r3b.done ] && [ ! -f doc/bench_rehearsal.json.r3b ]; then
        tail -1 /tmp/bench_rehearsal_r3b.log > doc/bench_rehearsal.json
        cp doc/bench_rehearsal.json doc/bench_rehearsal.json.r3b
    fi
    echo "[chain6] ALL DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    exit 0
done
