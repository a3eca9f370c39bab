#!/bin/bash
# Fresh-microVM repopulation, BREADTH-FIRST variant of run_r2_repopulate.sh.
#
# Rationale: on a new machine the compile cache is cold and the round's
# wall-clock may be short, so we want (a) bench.py's flagship program warm
# for the driver's end-of-round run, (b) as many distinct nets/<expt>
# outputs as possible for the figure CLIs / descriptor-schema checks, and
# only then (c) the long 80k-iter runs. Figures are regenerated after each
# phase so an interrupted chain still leaves a coherent artifact set.
#
# Every training step is --resume: re-running this script after an
# interruption (or on the next round's fresh VM) continues where it left
# off given the same nets/ contents.
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
    fi
}

figs() {
    run figs-acc-eff ./scripts/make-acc-eff-plots
    run figs-routing ./scripts/make-routing-hists
    run figs-pres    ./scripts/make-pres-figs
}

# Phase 0: warm the flagship sweep program (same program family the driver's
# bench.py run compiles) and record the number.
run bench-warm timeout 3600 python bench.py

# Phase A: 10k hybrid ablation suite (9 outputs; programs shared across most).
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
run hybrid-ac-globopt ./scripts/train-nets hybrid-ac-globopt --resume --vmap-sweep $HY
figs

# Phase B: dataset-complexity + width suites (10 more outputs, short budgets).
run cifar2-sr        ./scripts/train-nets cifar2-sr --resume  $HY
run cifar2-ac        ./scripts/train-nets cifar2-ac --resume  --vmap-sweep $HY
run cifar5-sr        ./scripts/train-nets cifar5-sr --resume  $HY
run cifar5-ac        ./scripts/train-nets cifar5-ac --resume  --vmap-sweep $HY
run cifar10-sr       ./scripts/train-nets cifar10-sr --resume $HY
run cifar10-ac       ./scripts/train-nets cifar10-ac --resume --vmap-sweep $HY
WS="--n-iter 5000 --precision bf16 --analytic-l2"
run cifar10-sr-fat    ./scripts/train-nets cifar10-sr-fat --resume    $WS
run cifar10-ac-fat    ./scripts/train-nets cifar10-ac-fat --resume    --vmap-sweep $WS
run cifar10-sr-fatter ./scripts/train-nets cifar10-sr-fatter --resume $WS
run cifar10-ac-fatter ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS
figs

# Phase C: full 80k reference-budget runs (each resumable at every t_log).
FB="--precision bf16 --analytic-l2"
run synth-ac         ./scripts/train-nets synth-ac --resume --vmap-sweep $FB
run synth-cr         ./scripts/train-nets synth-cr --resume --vmap-sweep $FB
run synth-sr         ./scripts/train-nets synth-sr --resume $FB
run synth-ac-globopt ./scripts/train-nets synth-ac-globopt --resume --vmap-sweep $FB
run cifar10-cr       ./scripts/train-nets cifar10-cr --resume --vmap-sweep $FB
run mnist-sr         ./scripts/train-nets mnist-sr --resume $FB
run synth-ac-dynkcpt ./scripts/train-adaptive-nets synth-ac-dynkcpt --resume --precision bf16
run synth-ac-tree-dynkcpt ./scripts/train-adaptive-nets synth-ac-tree-dynkcpt --resume --precision bf16 --stacked-tails
figs

# Phase D: full-budget trees + adaptive trees (the longest programs).
run synth-ac-tree    ./scripts/train-nets synth-ac-tree --resume --vmap-sweep $FB
run synth-cr-tree    ./scripts/train-nets synth-cr-tree --resume --vmap-sweep $FB
run hybrid-ac-tree-dynkcpt ./scripts/train-adaptive-nets hybrid-ac-tree-dynkcpt --resume --precision bf16 --stacked-tails
run hybrid-cr-tree-dynkcpt ./scripts/train-adaptive-nets hybrid-cr-tree-dynkcpt --resume --precision bf16 --stacked-tails
figs
run figs-nlds ./scripts/make-nlds
echo "=== breadth-first repopulate done ===" | tee -a nets/campaign-logs/campaign.log
