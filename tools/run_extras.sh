#!/bin/bash
# Follow-on to run_full_budget.sh: full-budget (80k-iter) TREE experiments
# that complete the tree story -- the critic tree sweep and the adaptive
# (dyn_k_cpt) trees on the hybrid stand-in. All resumable at every t_log.
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

run synth-cr-tree ./scripts/train-nets synth-cr-tree --resume --vmap-sweep --precision bf16 --analytic-l2
run hybrid-ac-tree-dynkcpt ./scripts/train-adaptive-nets hybrid-ac-tree-dynkcpt --resume --precision bf16
run hybrid-cr-tree-dynkcpt ./scripts/train-adaptive-nets hybrid-cr-tree-dynkcpt --resume --precision bf16
echo "=== extras complete" | tee -a nets/campaign-logs/campaign.log
