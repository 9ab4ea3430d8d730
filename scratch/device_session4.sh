#!/bin/bash
# Round-3 device-session chain, take 2 (after the KL-writer fix):
#   1. CLI pipeline timing (mid)   -> doc/cli_tpu.json (file-vs-resident gap)
#   2. mbatch sweep                -> doc/mbatch_ab.json (headline m-batch)
#   3. bench rehearsal             -> doc/bench_rehearsal.json + warm caches
#   4. pallas/Mosaic probe (informational)
#   5. north-star product run (window-checkpointed, hours)
# Decision records run before the long job (round-2 verdict weak #9).
# Steps are gated on their *output record* where one exists, so a
# restarted chain never repeats finished work.
#
# Arbitration: steps register in /tmp/tpu_client.pid; the driver's bench
# preempts the holder with SIGINT.  `held` is checked before every step.
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
        echo "[chain4] device held by pid $(cut -d' ' -f1 /tmp/tpu_client.pid); waiting $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 180
        return 0
    fi
    return 1
}

step() {  # step <name> <donefile> <cmd...>
    local name="$1" done="$2"; shift 2
    [ -f "$done" ] && return 0
    if yield_if_held; then return 1; fi
    echo "[chain4] $name... $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    if "$@" > "/tmp/${name}.log" 2>&1; then
        [ -f "$done" ] || touch "$done"
        echo "[chain4] $name DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        return 0
    fi
    echo "[chain4] $name failed; relooping" >> /tmp/device_session.log
    sleep 60
    return 1
}

while true; do
    if yield_if_held; then continue; fi
    if python scratch/tpu_preflight.py >> /tmp/device_session.log 2>&1; then
        echo "[chain4] preflight OK $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        step cli_tpu_mid /root/repo/doc/cli_tpu.json \
            python scratch/cli_tpu.py || continue
        step mbatch_ab /root/repo/doc/mbatch_ab.json \
            python scratch/mbatch_ab.py || continue
        step bench_rehearsal /tmp/bench_rehearsal.done \
            python bench.py || continue
        if [ -f /tmp/bench_rehearsal.done ] && [ ! -f doc/bench_rehearsal.json ]; then
            tail -1 /tmp/bench_rehearsal.log > doc/bench_rehearsal.json
        fi
        if [ ! -f /tmp/pallas_probe.done ]; then
            if yield_if_held; then continue; fi
            echo "[chain4] pallas probe..." >> /tmp/device_session.log
            # SIGINT (not TERM) on expiry: a hard-killed TPU client
            # wedges the device claim for 20-65 min
            timeout -s INT 900 python scratch/pallas_probe.py > /tmp/pallas_probe.log 2>&1 || true
            if held; then
                echo "[chain4] pallas probe preempted; relooping" >> /tmp/device_session.log
                continue
            fi
            touch /tmp/pallas_probe.done
        fi
        if [ ! -f /root/repo/doc/northstar_run.json ]; then
            if yield_if_held; then continue; fi
            echo "[chain4] northstar..." >> /tmp/device_session.log
            python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
                || { echo "[chain4] northstar failed; relooping" >> /tmp/device_session.log; sleep 60; continue; }
            echo "[chain4] northstar DONE" >> /tmp/device_session.log
        fi
        echo "[chain4] ALL DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        exit 0
    else
        echo "[chain4] preflight no device $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    fi
    sleep 180
done
