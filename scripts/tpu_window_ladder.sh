#!/bin/bash
# Unattended TPU-window ladder (VERDICT r3 item 2).
#
# When the axon tunnel (port 8093) answers, run the highest-value items in
# strict priority order — bench FIRST, so any window, attended or not,
# yields a driver-visible perf number — each under its own timeout,
# checkpointing results to WINDOW_LOG.md in the repo after every item.
#
# Safe to run from cron every ~20 min: a flock serializes invocations and a
# stamp file stops the ladder re-running completed items inside one window
# (delete /tmp/tpu_ladder_done.* to force a re-run).

set -u
REPO=/root/repo
LOG="$REPO/WINDOW_LOG.md"
LOCK=/tmp/tpu_ladder.lock
DONE_DIR=/tmp/tpu_ladder_done
cd "$REPO" || exit 1
export PYTHONPATH="$REPO:/root/.axon_site"

# 1. Is the tunnel up?
if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
    exit 0
fi

# 2. One ladder at a time.
exec 9>"$LOCK"
flock -n 9 || exit 0

mkdir -p "$DONE_DIR"
stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

note() {
    echo "- $(stamp) $1" >> "$LOG"
}

run_item() {
    # run_item <name> <timeout-s> <cmd...>
    local name=$1 tmo=$2; shift 2
    [ -e "$DONE_DIR/$name" ] && return 0
    # re-check tunnel before each item; a died tunnel ends the ladder
    if ! timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8093' 2>/dev/null; then
        note "tunnel died before item $name — ladder stopped"
        exit 0
    fi
    note "START $name (timeout ${tmo}s): $*"
    local out rc
    out=$(timeout "$tmo" "$@" 2>&1)
    rc=$?
    # checkpoint: full output to a per-item file, tail into the log
    echo "$out" > "$DONE_DIR/$name.out"
    {
        echo "  - rc=$rc; tail:"
        echo "$out" | tail -15 | sed 's/^/        /'
    } >> "$LOG"
    [ $rc -eq 0 ] && touch "$DONE_DIR/$name"
    return $rc
}

if [ ! -e "$DONE_DIR/window_open" ]; then
    echo "" >> "$LOG"
    echo "## Window opened $(stamp)" >> "$LOG"
    touch "$DONE_DIR/window_open"
fi

# --- Priority ladder -------------------------------------------------------
# 1-2. The driver-scoreboard numbers, before anything else.
run_item bench_fwd   2400 python bench.py
run_item bench_train 3600 python bench.py train
# 3. Radix vs 2-key sort (TPU_TODO r5 item 1).
run_item probe_radix 1800 python probe_radix_tpu.py
# 4. Outdoor end-to-end, hash vs join (TPU_TODO r5 item 2).
run_item probe_outdoor 2400 python probe_outdoor.py 32768
# 5. Pallas attention bwd tile A/B (TPU_TODO r5 item 3): bigger query
#    stripes at pad64's cheap Cg=128.
run_item probe_attn_bwd 3000 env SCENESPLAT_ATTN_BWD_TILE=1024 python probe_attn_tpu.py
# 6. Pallas attention kernel baseline (compile-heavy; LAST).
run_item probe_attn 3000 python probe_attn_tpu.py

note "ladder complete"
