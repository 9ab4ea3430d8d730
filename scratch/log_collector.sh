#!/bin/bash
# Mirror the device-session chain's /tmp evidence into the repo's doc/
# tree as it appears, so a round ending mid-run still ships the A/B
# results, the pallas probe outcome, and partial north-star progress.
# Runs alongside scratch/device_session.sh; never touches the device.
cd /root/repo
while true; do
    # mirror unconditionally: a step that keeps failing-and-relooping
    # never gets a .done marker, and its tracebacks are exactly the
    # evidence worth shipping
    for name in topband_ab_stress topband_ab_bench sht_ab pallas_probe; do
        if [ -f /tmp/${name}.log ]; then
            cmp -s /tmp/${name}.log doc/${name}.log 2>/dev/null \
                || cp /tmp/${name}.log doc/${name}.log
        fi
    done
    # north-star log: copy continuously (window checkpoints land as
    # lines; a partial copy is still evidence of progress)
    if [ -f /tmp/northstar_run.log ]; then
        cmp -s /tmp/northstar_run.log doc/northstar_run.log 2>/dev/null \
            || cp /tmp/northstar_run.log doc/northstar_run.log
    fi
    sleep 60
done
