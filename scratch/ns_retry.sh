#!/bin/bash
# Retry wrapper: backend init can fail UNAVAILABLE while the terminal
# recovers from a dead client's claim. Never hard-kills the child.
for i in 1 2 3 4 5 6; do
    echo "[ns_retry] attempt $i $(date -u +%H:%M:%S)" >> /tmp/northstar_run.log
    python /root/repo/scratch/northstar.py >> /tmp/northstar_run.log 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then echo "[ns_retry] SUCCESS" >> /tmp/northstar_run.log; exit 0; fi
    echo "[ns_retry] exit $rc; sleeping 300" >> /tmp/northstar_run.log
    sleep 300
done
echo "[ns_retry] GAVE UP" >> /tmp/northstar_run.log
