#!/bin/bash
# Round-4 device chain.  Owns the TPU work queue after the running ns1
# window loop; every step is gated on its committed output record so a
# restarted chain (session crash, container swap) never repeats
# finished work.  Absolute deadlines keep the chip free for the round's
# final bench.
#
#   1. ns1 (scratch/northstar.py, scale axis) to completion or
#      NS1_DEADLINE -> doc/northstar_run.json[.partial]
#      + stall watchdog: no new window checkpoint for STALL_MIN while a
#        client holds the chip -> SIGINT (safe kill), escalate TERM.
#   2. exact_profile (mb=64 stage table + levers) -> doc/exact_profile.json
#   3. topband on-chip forensic (k2x etc)   -> doc/topband_forensic_chip.json
#   4. CLI warm/cold measurement            -> doc/cli_tpu.json refresh
#   5. ns2 (production-shaped, NS2_DEADLINE)-> doc/northstar2_run.json
#   6. bench rehearsal                      -> doc/bench_record.json refresh
#
# Deadlines (override via env before launch):
NS1_DEADLINE=${NS1_DEADLINE:-$(date -d "13:05" +%s)}
NS2_DEADLINE=${NS2_DEADLINE:-$(date -d "15:15" +%s)}
CHAIN_END=${CHAIN_END:-$(date -d "15:50" +%s)}
STALL_MIN=${STALL_MIN:-55}

cd /root/repo
LOG=/tmp/chain7.log
say() { echo "[chain7] $* $(date -u +%H:%M:%S)" >> "$LOG"; }

holder_pid() { cut -d' ' -f1 /tmp/tpu_client.pid 2>/dev/null; }

held() {
    local pid; pid=$(holder_pid)
    { [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; } || return 1
    grep -qa "python" "/proc/$pid/cmdline" 2>/dev/null || return 1
    return 0
}

# newest mtime (epoch) across the window-checkpoint dirs
newest_ckpt() {
    find ckpt/ns_windows ckpt/ns2_windows -name "*.npz" -printf "%T@\n" \
        2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

# SIGINT the holder if it has made no checkpoint for STALL_MIN minutes;
# escalate to SIGTERM after 4 more minutes.  Never SIGKILL (wedges the
# device claim for 20-65 min).
watchdog() {
    held || return 0
    local pid last now age
    pid=$(holder_pid)
    last=$(newest_ckpt); now=$(date +%s)
    [ -n "$last" ] || last=$(stat -c %Y /tmp/tpu_client.pid 2>/dev/null || echo "$now")
    age=$(( (now - last) / 60 ))
    if [ "$age" -ge "$STALL_MIN" ]; then
        say "holder $pid stalled ${age}min; SIGINT"
        kill -INT "$pid" 2>/dev/null
        for i in $(seq 1 24); do
            sleep 10; kill -0 "$pid" 2>/dev/null || { say "holder exited after INT"; return 0; }
        done
        say "holder ignored INT; SIGTERM"
        kill -TERM "$pid" 2>/dev/null
        for i in $(seq 1 18); do
            sleep 10; kill -0 "$pid" 2>/dev/null || { say "holder exited after TERM"; return 0; }
        done
        say "holder survives TERM; leaving it (no SIGKILL on this platform)"
    fi
    return 0
}

committed() { git log --oneline -40 | grep -q "$1"; }

commit_doc() {  # commit_doc <msg> <paths...>
    local msg="$1"; shift
    for _try in 1 2 3; do
        git add "$@" 2>/dev/null && git commit -q -m "$msg" -- "$@" && return 0
        sleep 5
    done
    say "commit failed: $msg"
}

step() {  # step <name> <gate-grep> <cmd...>
    local name="$1" gate="$2"; shift 2
    committed "$gate" && return 0
    if held; then watchdog; sleep 60; return 1; fi
    [ "$(date +%s)" -ge "$CHAIN_END" ] && { say "past CHAIN_END; skip $name"; return 0; }
    say "$name..."
    if "$@" > "/tmp/${name}.log" 2>&1; then
        say "$name DONE"
        return 0
    fi
    say "$name FAILED (see /tmp/${name}.log)"
    sleep 60
    return 1
}

while true; do
    # ---- phase 1: ns1 to completion / deadline ----
    if [ ! -f doc/northstar_run.json ] && [ ! -f doc/northstar_run.json.partial ]; then
        if held; then
            watchdog
            sleep 60
            continue
        fi
        if [ "$(date +%s)" -lt "$NS1_DEADLINE" ]; then
            say "ns1 (deadline $(date -d @$NS1_DEADLINE -u +%H:%M))..."
            NS_DEADLINE=$NS1_DEADLINE python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 \
                || { say "ns1 failed; relooping"; sleep 120; continue; }
        else
            say "ns1 deadline passed with no run; writing partial via one no-window pass"
            NS_DEADLINE=$NS1_DEADLINE python scratch/northstar.py >> /tmp/northstar_run.log 2>&1 || true
        fi
        if [ -f doc/northstar_run.json ] || [ -f doc/northstar_run.json.partial ]; then
            commit_doc "North-star scale-run record" doc/northstar_run.json* doc/northstar_fisher.npz
        fi
        continue
    fi

    # ---- phase 2: short on-chip measurements ----
    step exact_profile_r4 "chain7: exact_profile r4" \
        python scratch/exact_profile.py || continue
    committed "chain7: exact_profile r4" || \
        commit_doc "chain7: exact_profile r4 (mb=64 stage table + levers)" doc/exact_profile.json

    step topband_chip "chain7: topband forensic chip" \
        env TB_CHIP=1 python scratch/topband_forensic.py || continue
    committed "chain7: topband forensic chip" || \
        commit_doc "chain7: topband forensic chip" doc/topband_forensic_chip.json

    step cli_tpu_r4 "chain7: cli_tpu r4" \
        python scratch/cli_tpu.py || continue
    committed "chain7: cli_tpu r4" || \
        commit_doc "chain7: cli_tpu r4 refresh" doc/cli_tpu.json

    # ---- phase 3: ns2 (production-shaped) ----
    if [ ! -f doc/northstar2_run.json ] && [ ! -f doc/northstar2_run.json.partial ]; then
        if held; then watchdog; sleep 60; continue; fi
        if [ "$(date +%s)" -lt "$NS2_DEADLINE" ]; then
            say "ns2 (deadline $(date -d @$NS2_DEADLINE -u +%H:%M))..."
            NS2_DEADLINE=$NS2_DEADLINE python scratch/northstar2.py >> /tmp/northstar2_run.log 2>&1 \
                || { say "ns2 failed; relooping"; sleep 120; continue; }
            commit_doc "Production-shaped north-star record" doc/northstar2_run.json* doc/northstar2_fisher.npz
        else
            say "ns2 deadline passed; skipping"
            touch /tmp/ns2_skipped
        fi
        continue
    fi

    # ---- phase 4: final bench rehearsal ----
    step bench_r4 "chain7: bench rehearsal r4" \
        python bench.py || continue
    committed "chain7: bench rehearsal r4" || \
        commit_doc "chain7: bench rehearsal r4" doc/bench_record.json

    say "ALL DONE"
    exit 0
done
