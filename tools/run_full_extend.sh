#!/bin/bash
# Phase F: extend the breadth-budget suites to full budgets.
#
# run_breadth_first.sh trains the complexity suite (cifar2/5/10 sr+ac)
# at 10k iters and the width suite (fat/fatter) at 5k as breadth
# stand-ins. This chain resumes those checkpoints and takes the
# complexity suite to the reference's full 80,000-iter budget
# (/root/reference/scripts/arch_and_hypers.py:33) and the width suite
# to 20k (the round-1 extended budget; fatter nets are ~15x the
# flagship's ops, 80k is not worth the chip-hours for an acc-eff
# panel). Same resumable run()/figs() contract as run_breadth_first.sh.
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
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/campaign.log
    fi
}

figs() {
    run figs-acc-eff ./scripts/make-acc-eff-plots
    run figs-routing ./scripts/make-routing-hists
    run figs-pres    ./scripts/make-pres-figs
}

FB="--precision bf16 --analytic-l2"

# Complexity suite to the full reference budget (registry default n_iter).
run cifar2-sr-80k  ./scripts/train-nets cifar2-sr --resume  $FB
run cifar2-ac-80k  ./scripts/train-nets cifar2-ac --resume  --vmap-sweep $FB
run cifar5-sr-80k  ./scripts/train-nets cifar5-sr --resume  $FB
run cifar5-ac-80k  ./scripts/train-nets cifar5-ac --resume  --vmap-sweep $FB
run cifar10-sr-80k ./scripts/train-nets cifar10-sr --resume $FB
run cifar10-ac-80k ./scripts/train-nets cifar10-ac --resume --vmap-sweep $FB
figs

# Width suite to 20k.
WS="--n-iter 20000 --precision bf16 --analytic-l2"
run cifar10-sr-fat-20k    ./scripts/train-nets cifar10-sr-fat --resume    $WS
run cifar10-ac-fat-20k    ./scripts/train-nets cifar10-ac-fat --resume    --vmap-sweep $WS
run cifar10-sr-fatter-20k ./scripts/train-nets cifar10-sr-fatter --resume $WS
run cifar10-ac-fatter-20k ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS
figs
run figs-nlds-extend ./scripts/make-nlds
echo "=== full-extend done ===" | tee -a nets/campaign-logs/campaign.log
