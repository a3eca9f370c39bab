#!/bin/bash
# Training campaign on the single v5e chip, two parts:
#
# 1. FULL reference budget (n_iter=80000, t_log=2500, batch 128 -- the exact
#    regime of reference scripts/arch_and_hypers.py:33-35) for the tiered-
#    synthetic chain suite + adaptive nets.
# 2. The reference's 9-experiment hybrid ablation suite (sr / ac / ac-nokdec /
#    ac-notalr / ac-tree / cr / cr-opt / cr-clserr / cr-notalr) on the
#    synthetic hybrid stand-in at 10k iters -- populates the 9-panel
#    training-strategy figure (reference make-acc-eff-plots:50-175).
#
# The 80k tree sweep runs LAST: it is the longest and every t_log boundary
# writes stats + a resumable checkpoint, so interrupting it still leaves
# usable results.
#
# Runs serially (one TPU). Each experiment is its own process; the
# persistent compile cache (.jax_cache/) is the only cross-run state.
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

# Part 1: full 80k reference budget, tiered synthetic.
run synth-ac         ./scripts/train-nets synth-ac --resume --vmap-sweep --precision bf16 --analytic-l2
run synth-cr         ./scripts/train-nets synth-cr --resume --vmap-sweep --precision bf16 --analytic-l2
run synth-sr         ./scripts/train-nets synth-sr --resume --precision bf16 --analytic-l2
run synth-ac-dynkcpt ./scripts/train-adaptive-nets synth-ac-dynkcpt --resume --precision bf16
run synth-ac-tree-dynkcpt ./scripts/train-adaptive-nets synth-ac-tree-dynkcpt --resume --precision bf16

# Part 2: the 9-experiment hybrid ablation suite, 10k iters.
HY="--n-iter 10000 --precision bf16 --analytic-l2"
run hybrid-ac        ./scripts/train-nets hybrid-ac --resume        --vmap-sweep $HY
run hybrid-ac-nokdec ./scripts/train-nets hybrid-ac-nokdec --resume --vmap-sweep $HY
run hybrid-ac-notalr ./scripts/train-nets hybrid-ac-notalr --resume --vmap-sweep $HY
run hybrid-cr        ./scripts/train-nets hybrid-cr --resume        --vmap-sweep $HY
run hybrid-cr-opt    ./scripts/train-nets hybrid-cr-opt --resume    --vmap-sweep $HY
run hybrid-cr-clserr ./scripts/train-nets hybrid-cr-clserr --resume --vmap-sweep $HY
run hybrid-cr-notalr ./scripts/train-nets hybrid-cr-notalr --resume --vmap-sweep $HY
run hybrid-sr        ./scripts/train-nets hybrid-sr --resume        $HY
run hybrid-ac-tree   ./scripts/train-nets hybrid-ac-tree --resume   --vmap-sweep $HY

# Part 2b: dataset-complexity suite (reference make-acc-eff-plots:181-199):
# cifar2/5/10 sr+ac on the synthetic CIFAR stand-ins, 10k iters.
run cifar2-sr        ./scripts/train-nets cifar2-sr --resume  $HY
run cifar2-ac        ./scripts/train-nets cifar2-ac --resume  --vmap-sweep $HY
run cifar5-sr        ./scripts/train-nets cifar5-sr --resume  $HY
run cifar5-ac        ./scripts/train-nets cifar5-ac --resume  --vmap-sweep $HY
run cifar10-sr       ./scripts/train-nets cifar10-sr --resume $HY
run cifar10-ac       ./scripts/train-nets cifar10-ac --resume --vmap-sweep $HY

# Part 2c: width-scaling suite (reference make-acc-eff-plots:205-236).
# 4x/9x the compute of the base nets, so a shorter budget bounds wall-clock.
WS="--n-iter 5000 --precision bf16 --analytic-l2"
run cifar10-sr-fat    ./scripts/train-nets cifar10-sr-fat --resume    $WS
run cifar10-ac-fat    ./scripts/train-nets cifar10-ac-fat --resume    --vmap-sweep $WS
run cifar10-sr-fatter ./scripts/train-nets cifar10-sr-fatter --resume $WS
run cifar10-ac-fatter ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS

# Part 3: the long one -- full-budget tree sweep (resumable at every t_log).
run synth-ac-tree    ./scripts/train-nets synth-ac-tree --resume --vmap-sweep --precision bf16 --analytic-l2
echo "=== campaign complete" | tee -a nets/campaign-logs/campaign.log
