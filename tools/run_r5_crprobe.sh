#!/bin/bash
# Round-5 CR price-insensitivity probe (VERDICT r4 next #5) + the
# hybrid-sr depth-8 outlier retry (VERDICT r4 next #6 follow-up).
#
# Sequence (one chip, serial):
#   1. synth-cr-dynkcpt           10k baseline (also fills the registry
#                                 gap: the synth adaptive suite had no CR)
#   2. synth-cr-dynkcpt-acpt1e9   price feature x100 (α_cpt 1e7 -> 1e9)
#   3. synth-cr-dynkcpt-tauhot    AC's hotter τ_ds schedule for a critic
#   4. cr_probe --route on each checkpoint -> results/cr-probe-*.json
#   5. hybrid-sr net 7 retrained with seed+100 into nets-probe/ — is the
#      0.150-err depth-8 member seed instability (like the width-ladder
#      lr-0.1 divergences) or systematic?
# Evidence lands in results/ (watcher commits it); ledger reading goes
# in docs/results-r5.md.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs results
echo $$ > /tmp/r5crprobe.pid
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/crprobe-r5.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/crprobe-r5.log
    [ $rc -ne 0 ] && tail -15 "nets/campaign-logs/$name.log"
    return $rc
}
for expt in synth-cr-dynkcpt synth-cr-dynkcpt-acpt1e9 synth-cr-dynkcpt-tauhot; do
    run "train-$expt" timeout 3600 ./scripts/train-adaptive-nets "$expt" \
        --n-iter 10000 --stats-log
    run "route-$expt" timeout 3600 python tools/cr_probe.py --route \
        --checkpoint "nets/$expt/net.npy" --data data/synth.npz \
        --json "results/cr-probe-$expt.json"
done
run weights-acpt1e9 python tools/cr_probe.py --weights \
    --checkpoint nets/synth-cr-dynkcpt-acpt1e9/net.npy \
    --json results/cr-probe-weights-acpt1e9.json
run train-hybrid-sr-seed100 timeout 3600 ./scripts/train-nets hybrid-sr \
    --net 7 --seed 100 --out-root nets-probe
run archive python tools/archive_results.py --roots nets nets-probe
echo "=== r5 crprobe chain done ===" | tee -a nets/campaign-logs/crprobe-r5.log
