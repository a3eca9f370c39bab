#!/bin/bash
# Repair job: a CPU smoke run accidentally overwrote nets/synth-sr/0000.npy
# (net 0's full-budget checkpoint) with a 60-iter checkpoint. train-nets is
# --resume-safe, so waiting for the main repopulation chain (pid in
# /tmp/repop.pid) and re-running net 0 to the full reference budget restores
# it; then the figure sets that consume synth-sr are regenerated.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs

# Wait for the whole repopulation chain: the pid file can be stale (it held
# a wrapper pid once), so also wait on any live run_r2_repopulate.sh /
# run_full_budget.sh / run_extras.sh process found via the process table.
wait_pid() { while [ -n "${1:-}" ] && kill -0 "$1" 2>/dev/null; do sleep 60; done; }
wait_pid "$(cat /tmp/repop.pid 2>/dev/null || true)"
for script in run_r2_repopulate.sh run_full_budget.sh run_extras.sh; do
    for pid in $(ps -eo pid,args | awk -v s="$script" '$0 ~ s && !/awk/ {print $1}'); do
        wait_pid "$pid"
    done
done

run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/campaign.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/campaign.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        exit $rc
    fi
}

run fix-synth-sr-0 ./scripts/train-nets synth-sr --resume --net 0 --precision bf16 --analytic-l2
run figs-acc-eff-fix ./scripts/make-acc-eff-plots
run figs-pres-fix    ./scripts/make-pres-figs
echo "=== synth-sr net 0 repair done ==="
