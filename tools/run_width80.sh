#!/bin/bash
# Phase G: take the width-scaling suite (fat/fatter) from 20k to the
# full 80,000-iter reference budget (/root/reference/scripts/
# arch_and_hypers.py:33), matching every other committed suite.
# run_full_extend.sh stopped the ladder at 20k to save chip-hours; the
# measured 20k extension times (6-14 min per experiment per 10k iters,
# nets/campaign-logs/campaign.log 15:42-16:21) make 80k affordable
# (~2-4 h total). Same resumable run()/figs() contract as
# run_breadth_first.sh; the archive watcher commits results/ as it goes.
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

WS="--n-iter 80000 --precision bf16 --analytic-l2"
run cifar10-sr-fat-80k    ./scripts/train-nets cifar10-sr-fat --resume    $WS
run cifar10-ac-fat-80k    ./scripts/train-nets cifar10-ac-fat --resume    --vmap-sweep $WS
run cifar10-sr-fatter-80k ./scripts/train-nets cifar10-sr-fatter --resume $WS
run cifar10-ac-fatter-80k ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS

run figs-acc-eff-w80 ./scripts/make-acc-eff-plots
run figs-pres-w80    ./scripts/make-pres-figs
echo "=== width-80k done ===" | tee -a nets/campaign-logs/campaign.log
