#!/bin/bash
# Preflight-gated device-session chain: cheap probes while the tunnel is
# down; once the TPU answers, run (in order, skipping what's done):
#   1. the top-band / QR-impl / interleave A/B at production-stress scale
#   2. the same A/B at benchmark scale
#   3. the SHT matmul-precision A/B (stress scale)
#   4. the pallas/Mosaic probe (informational)
#   5. the north-star product run (per-window checkpoints; writes
#      doc/northstar_run.json on success) — topband engine by default
# The quick A/Bs run FIRST: they take minutes and their decision records
# set the bench defaults; the north-star run takes hours and is window-
# checkpointed, so a late device fault only costs the current window.
# Each step's log goes to /tmp/; the loop survives device faults by
# re-probing and re-entering wherever it left off.
#
# Arbitration: every chain step registers itself in /tmp/tpu_client.pid
# (scratch/_tpu_pidfile.py); the driver's bench preempts the holder with
# SIGINT and registers ITS pid there.  `held` is checked before every
# step — never launch a client while someone else (the bench) owns the
# device; a steps's non-zero exit (e.g. it was preempted) reloops.
cd /root/repo

held() {
    [ -f /tmp/tpu_client.pid ] || return 1
    local pid
    pid=$(cut -d' ' -f1 /tmp/tpu_client.pid 2>/dev/null)
    { [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; } || return 1
    # identity check: only yield to a python client (bench/chain step),
    # never to an unrelated process that recycled a stale pid
    grep -qa "python" "/proc/$pid/cmdline" 2>/dev/null || return 1
    return 0
}

yield_if_held() {
    if held; then
        echo "[chain] device held by pid $(cut -d' ' -f1 /tmp/tpu_client.pid); waiting $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        sleep 180
        return 0
    fi
    return 1
}

while true; do
    if yield_if_held; then continue; fi
    if python scratch/tpu_preflight.py >> /tmp/device_session.log 2>&1; then
        echo "[chain] preflight OK $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        if [ ! -f /tmp/topband_ab_stress.done ]; then
            if yield_if_held; then continue; fi
            echo "[chain] topband A/B (stress)..." >> /tmp/device_session.log
            STRESS=1 python scratch/topband_ab.py > /tmp/topband_ab_stress.log 2>&1 \
                && touch /tmp/topband_ab_stress.done \
                || { echo "[chain] stress A/B failed; relooping" >> /tmp/device_session.log; sleep 60; continue; }
        fi
        if [ ! -f /tmp/topband_ab_bench.done ]; then
            if yield_if_held; then continue; fi
            echo "[chain] topband A/B (bench scale)..." >> /tmp/device_session.log
            python scratch/topband_ab.py > /tmp/topband_ab_bench.log 2>&1 \
                && touch /tmp/topband_ab_bench.done \
                || { echo "[chain] bench A/B failed; relooping" >> /tmp/device_session.log; sleep 60; continue; }
        fi
        if [ ! -f /tmp/sht_ab.done ]; then
            if yield_if_held; then continue; fi
            # SHT matmul-precision A/B (stress scale): writes the
            # accuracy-gated doc/sht_ab.json that bench + northstar adopt
            echo "[chain] sht precision A/B (stress)..." >> /tmp/device_session.log
            STRESS=1 python scratch/sht_ab.py > /tmp/sht_ab.log 2>&1 \
                && touch /tmp/sht_ab.done \
                || { echo "[chain] sht A/B failed; relooping" >> /tmp/device_session.log; sleep 60; continue; }
        fi
        if [ ! -f /tmp/pallas_probe.done ]; then
            if yield_if_held; then continue; fi
            # informational: does Pallas/Mosaic lower on this runtime?
            echo "[chain] pallas probe..." >> /tmp/device_session.log
            # SIGINT (not TERM) on expiry: a hard-killed TPU client
            # wedges the device claim for 20-65 min
            timeout -s INT 900 python scratch/pallas_probe.py > /tmp/pallas_probe.log 2>&1 || true
            # a bench preemption also lands here (exit masked by the
            # || true): don't mark done while someone else holds the
            # device — reloop and re-run the probe later instead
            if held; then
                echo "[chain] pallas probe preempted; relooping" >> /tmp/device_session.log
                continue
            fi
            touch /tmp/pallas_probe.done
        fi
        if [ ! -f /root/repo/doc/northstar_run.json ]; then
            if yield_if_held; then continue; fi
            echo "[chain] northstar..." >> /tmp/device_session.log
            python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
                || { echo "[chain] northstar failed; relooping" >> /tmp/device_session.log; sleep 60; continue; }
            echo "[chain] northstar DONE" >> /tmp/device_session.log
        fi
        echo "[chain] ALL DONE $(date -u +%H:%M:%S)" >> /tmp/device_session.log
        exit 0
    else
        echo "[chain] preflight no device $(date -u +%H:%M:%S)" >> /tmp/device_session.log
    fi
    sleep 180
done
