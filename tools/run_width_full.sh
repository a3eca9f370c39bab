#!/bin/bash
# Extend the width-scaling suite from 20k iters to the reference's FULL 80k
# iters by resuming the per-net checkpoints (round-2: the width panels
# now match the reference budget of every other suite). Resumable like
# everything else; chunk length stays t_log=2500 so programs stay cached.
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

WS="--n-iter 80000 --precision bf16 --analytic-l2 --resume"
run cifar10-ac-fat     ./scripts/train-nets cifar10-ac-fat     --vmap-sweep $WS
run cifar10-ac-fatter  ./scripts/train-nets cifar10-ac-fatter  --vmap-sweep $WS
run cifar10-sr-fat     ./scripts/train-nets cifar10-sr-fat     $WS
run cifar10-sr-fatter  ./scripts/train-nets cifar10-sr-fatter  $WS
echo "=== width extension complete" | tee -a nets/campaign-logs/campaign.log
