#!/bin/bash
# SUPERSEDED (round 5): device chains now run through the unit-tested
# Python runner scratch/chainrunner.py (tests/test_chainrunner.py).
# Known bug kept for the record (round-4 advisor): step() returns 0 on
# the skip paths, and the unconditional `committed || commit_doc` after
# it can commit a fail-soft 0.0 record under the success gate message.
# The Python runner fixes both (skip is a distinct outcome; records
# with "failed": true or value 0 are never committed).  Do not copy
# this file an 11th time.
# Round-4 device chain, v4 (~02:00 UTC 2026-08-21).  Context: today's
# tunnel instance wedges on the ns1 window-14 dispatch — two attempts,
# zero windows in 100 min (historical pace: 11 min/window), host and
# eth0 counters flat while the client polls.  The v3 ordering would
# have burned the whole session retrying ns1.  This version:
#   - ns1 is launched once with a PAST deadline so it writes its
#     .partial record (13/20 windows committed) and frees the chip;
#   - a SMALL bench smoke runs first as the canary: if today's tunnel
#     can't even do bench-scale dispatches, every later step fail-caps
#     quickly instead of eating its full timeout twice;
#   - tightened timeouts; ns2 (light: 16 freqs, mmax 313) before the
#     full bench rehearsal; an optional ns1 retry only at the end if
#     time remains.
NOW=$(date +%s)
NS2_DEADLINE=${NS2_DEADLINE:-$((NOW + 135*60))}
CHAIN_END=${CHAIN_END:-$((NOW + 165*60))}
STALL_MIN=${STALL_MIN:-35}

cd /root/repo
LOG=/tmp/chain10.log
say() { echo "[chain10] $* $(date -u +%H:%M:%S)" >> "$LOG"; }

holder_pid() { cut -d' ' -f1 /tmp/tpu_client.pid 2>/dev/null; }

held() {
    local pid; pid=$(holder_pid)
    { [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; } || return 1
    grep -qa "python" "/proc/$pid/cmdline" 2>/dev/null || return 1
    return 0
}

newest_ckpt() {
    find ckpt/ns_windows ckpt/ns2_windows -name "*.npz" -printf "%T@\n" \
        2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

stall_age() {  # stall_age <baseline-epoch>
    local last now
    last=$(newest_ckpt); now=$(date +%s)
    [ -n "$last" ] || last=0
    [ "$last" -lt "$1" ] && last=$1
    echo $(( (now - last) / 60 ))
}

interrupt_then_term() {  # <pid> <label>
    say "$2 stalled; SIGINT $1"
    kill -INT "$1" 2>/dev/null
    for i in $(seq 1 24); do
        sleep 10; kill -0 "$1" 2>/dev/null || { say "$2 exited after INT"; return 0; }
    done
    say "$2 ignored INT; SIGTERM"
    kill -TERM "$1" 2>/dev/null
    for i in $(seq 1 18); do
        sleep 10; kill -0 "$1" 2>/dev/null || { say "$2 exited after TERM"; return 0; }
    done
    say "$2 survives TERM; leaving it (no SIGKILL on this platform)"
    return 1
}

run_watched() {  # run_watched <name> <logfile> <cmd...>
    local name="$1" logf="$2"; shift 2
    local start; start=$(date +%s)
    "$@" >> "$logf" 2>&1 &
    local pid=$!
    say "$name started (pid $pid)"
    while kill -0 "$pid" 2>/dev/null; do
        sleep 60
        if [ "$(stall_age "$start")" -ge "$STALL_MIN" ]; then
            interrupt_then_term "$pid" "$name"
            start=$(date +%s)
        fi
    done
    wait "$pid"
}

watchdog_external() {
    held || return 0
    local pid age
    pid=$(holder_pid)
    age=$(stall_age "$(stat -c %Y /tmp/tpu_client.pid 2>/dev/null || date +%s)")
    [ "$age" -ge "$STALL_MIN" ] && interrupt_then_term "$pid" "external holder $pid"
    return 0
}

committed() { git log --oneline -90 | grep -q "$1"; }

commit_doc() {  # commit_doc <msg> <paths...>
    local msg="$1"; shift
    for _try in 1 2 3; do
        git add "$@" 2>/dev/null && git commit -q -m "$msg" -- "$@" && return 0
        sleep 5
    done
    say "commit failed: $msg"
}

step() {  # step <name> <gate-grep> <timeout-s> <cmd...>
    local name="$1" gate="$2" tmo="$3"; shift 3
    committed "$gate" && return 0
    local failf="/tmp/chain10_fail_${name}" fails=0
    [ -f "$failf" ] && fails=$(cat "$failf")
    [ "$fails" -ge 2 ] && { say "$name skipped after $fails failures"; return 0; }
    if held; then watchdog_external; sleep 60; return 1; fi
    [ "$(date +%s)" -ge "$CHAIN_END" ] && { say "past CHAIN_END; skip $name"; return 0; }
    say "$name..."
    if timeout -s INT "$tmo" "$@" > "/tmp/${name}.log" 2>&1; then
        say "$name DONE"
        rm -f "$failf"
        return 0
    fi
    echo $((fails + 1)) > "$failf"
    say "$name FAILED/timeout #$((fails + 1)) (see /tmp/${name}.log)"
    sleep 60
    return 1
}

say "start (ns2 deadline $(date -d @$NS2_DEADLINE -u +%H:%M), end $(date -d @$CHAIN_END -u +%H:%M))"

while true; do
    # ---- phase 1: ns1 partial record (deadline already past) ----
    if [ ! -f doc/northstar_run.json ] && [ ! -f doc/northstar_run.json.partial ]; then
        if held; then watchdog_external; sleep 60; continue; fi
        say "ns1 partial-record pass..."
        run_watched ns1partial /tmp/northstar_run.log \
            env NS_DEADLINE=$(( $(date +%s) - 60 )) python scratch/northstar.py \
            || say "ns1 partial pass failed"
        if [ -f doc/northstar_run.json ] || [ -f doc/northstar_run.json.partial ]; then
            commit_doc "North-star scale-run record (partial: tunnel wedge on window dispatch)" \
                doc/northstar_run.json* doc/northstar_fisher.npz
        fi
        continue
    fi

    if [ -n "$(git status --porcelain doc/northstar_run.json* 2>/dev/null)" ]; then
        commit_doc "North-star scale-run record" doc/northstar_run.json* doc/northstar_fisher.npz
    fi

    # ---- phase 2: canary, then measurements ----
    step bench_smoke_r4 "chain7: bench smoke r4" 1800 \
        env BENCH_SCALE=small BENCH_POL=0 \
        BENCH_RECORD_PATH=/root/repo/doc/bench_smoke.json \
        python bench.py || continue
    committed "chain7: bench smoke r4" || \
        commit_doc "chain7: bench smoke r4" doc/bench_smoke.json

    step exact_profile_r4 "chain7: exact_profile r4" 4500 \
        python scratch/exact_profile.py || continue
    committed "chain7: exact_profile r4" || \
        commit_doc "chain7: exact_profile r4 (mb=64 stage table + combo levers)" doc/exact_profile.json

    step topband_chip "chain7: topband forensic chip" 2700 \
        env TB_CHIP=1 python scratch/topband_forensic.py || continue
    committed "chain7: topband forensic chip" || \
        commit_doc "chain7: topband forensic chip" doc/topband_forensic_chip.json

    # ---- phase 3: ns2 (production-shaped; caches prebuilt) ----
    if [ ! -f doc/northstar2_run.json ] && [ ! -f doc/northstar2_run.json.partial ]; then
        if held; then watchdog_external; sleep 60; continue; fi
        if [ "$(date +%s)" -lt "$NS2_DEADLINE" ]; then
            say "ns2 (deadline $(date -d @$NS2_DEADLINE -u +%H:%M))..."
            run_watched ns2 /tmp/northstar2_run.log \
                env NS2_DEADLINE=$NS2_DEADLINE python scratch/northstar2.py \
                || { say "ns2 failed; relooping"; sleep 120; continue; }
            commit_doc "Production-shaped north-star record" doc/northstar2_run.json* doc/northstar2_fisher.npz
        else
            say "ns2 deadline passed; writing skip marker"
            echo '{"skipped": "chain10 ns2 deadline passed before the step could start"}' \
                > doc/northstar2_run.json.partial
        fi
        continue
    fi

    # ---- phase 4: CLI refresh ----
    step cli_tpu_r4 "chain7: cli_tpu r4" 5400 \
        python scratch/cli_tpu.py || continue
    committed "chain7: cli_tpu r4" || \
        commit_doc "chain7: cli_tpu r4 refresh" doc/cli_tpu.json

    # ---- phase 5: bench rehearsal ----
    step bench_r4 "chain7: bench rehearsal r4" 4200 \
        python bench.py || continue
    committed "chain7: bench rehearsal r4" || \
        commit_doc "chain7: bench rehearsal r4" doc/bench_record.json

    # ---- phase 6: optional ns1 window retry with remaining time ----
    if [ -f doc/northstar_run.json.partial ] && [ ! -f doc/northstar_run.json ] \
        && [ ! -f /tmp/ns1_retry_done ]; then
        left=$(( CHAIN_END - $(date +%s) ))
        if [ "$left" -gt 1500 ]; then
            say "ns1 end-of-chain retry ($((left/60)) min left)..."
            run_watched ns1retry /tmp/northstar_run.log \
                env NS_DEADLINE=$(( CHAIN_END - 300 )) python scratch/northstar.py \
                || say "ns1 retry failed"
            touch /tmp/ns1_retry_done
            if [ -f doc/northstar_run.json ]; then
                git rm -q --cached doc/northstar_run.json.partial 2>/dev/null
                rm -f doc/northstar_run.json.partial
            fi
            commit_doc "North-star scale-run record (end-of-chain retry)" \
                doc/northstar_run.json* doc/northstar_fisher.npz
            continue
        fi
    fi

    say "ALL DONE"
    exit 0
done
