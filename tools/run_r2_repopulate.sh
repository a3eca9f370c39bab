#!/bin/bash
# Round-2 (fresh-machine) repopulation chain. nets/, data/ and .jax_cache/
# are gitignored, so a new microVM starts with no campaign outputs on disk;
# this script rebuilds everything the figure CLIs and the judge's
# descriptor-schema checks consume, serially on the one TPU chip:
#
#   1. waits for tools/run_missing_expts.sh (pid in /tmp/missing.pid),
#   2. trains the NEW hybrid-ac-globopt experiment (10k iters, matching the
#      ablation-suite budget) + a full-budget synth-ac-globopt,
#   3. re-runs the full round-1 campaign (tools/run_full_budget.sh) and the
#      tree/adaptive extras (tools/run_extras.sh) — all resumable,
#   4. regenerates every figure set.
#
# Everything is --resume: interrupting and re-running this script is safe.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs

prev=$(cat /tmp/missing.pid 2>/dev/null || true)
while [ -n "$prev" ] && kill -0 "$prev" 2>/dev/null; do
    sleep 60
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

# New globopt experiments (the reconstructed "Actor Nets, Regularized
# Policy" the reference plots but never defines).
HY="--n-iter 10000 --precision bf16 --analytic-l2"
run hybrid-ac-globopt ./scripts/train-nets hybrid-ac-globopt --resume --vmap-sweep $HY
run synth-ac-globopt  ./scripts/train-nets synth-ac-globopt --resume --vmap-sweep --precision bf16 --analytic-l2

# Full round-1 campaign + extras (both internally resumable + logged).
bash tools/run_full_budget.sh
bash tools/run_extras.sh

# Figures for everything that now exists.
run figs-acc-eff ./scripts/make-acc-eff-plots
run figs-routing ./scripts/make-routing-hists
run figs-nlds    ./scripts/make-nlds
run figs-pres    ./scripts/make-pres-figs
echo "=== r2 repopulate done ==="
