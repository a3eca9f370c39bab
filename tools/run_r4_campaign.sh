#!/bin/bash
# Round-4 on-chip campaign (VERDICT r3 next #1-2):
#   a. retry the dead members of the already-80k suites (cifar10-sr-fat
#      net 0, cifar5-sr net 0, mnist-sr net 0) under the documented
#      divergence policy (tools/retrain_diverged.py: seed+100, diverged
#      stats/logs preserved under *-diverged-* names);
#   b. take the remaining width-ladder experiments from scratch to the
#      full 80,000-iter reference budget (their 20k checkpoints died
#      with the r3 VM; stats-only restores cannot resume) — matching
#      /root/reference/scripts/arch_and_hypers.py:33 for all four;
#   c. rescan those for fresh-trajectory divergences and retry;
#   d. archive final checkpoints + regenerate the width/complexity
#      figure panels.
# Same resumable run() contract as run_breadth_first.sh; the archive
# watcher commits results/ as it goes.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
# Self-register for tools/idle_chip.py (see run_r4_boot.sh note).
echo $$ > /tmp/r4campaign.pid

run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/campaign.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/campaign.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/campaign.log
    fi
}

WS="--n-iter 80000 --precision bf16 --analytic-l2"

run retry-complete python tools/retrain_diverged.py cifar10-sr-fat cifar5-sr mnist-sr
run ckpt-archive-1 python tools/archive_results.py --include-checkpoints

# timeout = hang insurance (observed 2026-08-20: a transient tunnel
# outage left an eval RPC hung for 49 min with the chip healthy; the
# runs are resumable, so a bounded kill + relaunch loses nothing).
run cifar10-ac-fat-80k    timeout 7200 ./scripts/train-nets cifar10-ac-fat --resume --vmap-sweep $WS
run cifar10-sr-fatter-80k timeout 7200 ./scripts/train-nets cifar10-sr-fatter --resume $WS
run cifar10-ac-fatter-80k timeout 7200 ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS

run retry-width python tools/retrain_diverged.py cifar10-ac-fat cifar10-sr-fatter cifar10-ac-fatter

run ckpt-archive-2 python tools/archive_results.py --include-checkpoints
run figs-acc-eff-r4 ./scripts/make-acc-eff-plots
run figs-pres-r4    ./scripts/make-pres-figs
echo "=== r4 width+retry campaign done ===" | tee -a nets/campaign-logs/campaign.log
