#!/bin/bash
# Preflight-gated north-star retry loop: cheap probes while the remote
# terminal is down, the real run only once the device answers.
while true; do
    if python /root/repo/scratch/tpu_preflight.py >> /tmp/northstar_run.log 2>&1; then
        echo "[ns_forever] preflight OK $(date -u +%H:%M:%S)" >> /tmp/northstar_run.log
        python /root/repo/scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
            && { echo "[ns_forever] SUCCESS" >> /tmp/northstar_run.log; exit 0; }
        echo "[ns_forever] northstar failed; looping" >> /tmp/northstar_run.log
    else
        echo "[ns_forever] preflight no device $(date -u +%H:%M:%S)" >> /tmp/northstar_run.log
    fi
    sleep 180
done
