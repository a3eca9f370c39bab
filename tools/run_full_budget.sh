#!/bin/bash
# Full reference-budget campaign: n_iter=80000, t_log=2500, batch 128 --
# the exact training regime of the reference (scripts/arch_and_hypers.py:33-35
# in /root/reference) -- on the tiered synthetic dataset, single v5e chip.
#
# Runs serially (one TPU). Each experiment is its own process so the
# persistent compile cache (.jax_cache/) is the only cross-run state.
# Logs to nets/campaign-logs/<name>.log; exits on first failure.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs

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

run synth-ac        ./scripts/train-nets synth-ac --vmap-sweep --precision bf16 --analytic-l2
run synth-cr        ./scripts/train-nets synth-cr --vmap-sweep --precision bf16 --analytic-l2
run synth-sr        ./scripts/train-nets synth-sr --precision bf16 --analytic-l2
run synth-ac-dynkcpt ./scripts/train-adaptive-nets synth-ac-dynkcpt --precision bf16
run synth-ac-tree   ./scripts/train-nets synth-ac-tree --vmap-sweep --precision bf16 --analytic-l2
run synth-ac-tree-dynkcpt ./scripts/train-adaptive-nets synth-ac-tree-dynkcpt --precision bf16
echo "=== campaign complete" | tee -a nets/campaign-logs/campaign.log
