#!/bin/bash
# Round-4 session-2 chip queue (fresh VM 2026-08-20/21). The previous
# VM died mid-way through run_r4_adaptives.sh: the two hybrid TREE
# adaptive finals were archived (commit 1d1a2e3) but hybrid-cr-dynkcpt,
# synth-ac-dynkcpt and synth-ac-tree-dynkcpt finals were lost, and
# run_r4_post.sh (warm frontier re-measure + tree frontier + figure
# refresh) never ran. This queue finishes both, ordered so the cheap
# durability work lands before the long cold-compile tree items:
#   1. backfill the three missing adaptive finals (archive after each)
#   2. serving-frontier on the flagship: pass 1 compiles, pass 2 is the
#      warm re-measure that replaces the two timing artifacts in
#      docs/results-r4.md §9
#   3. tree frontier (arbitrary-topology engine demo; bounded)
#   4. stats-fed figure refresh + final archive
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
echo $$ > /tmp/r4b.pid

run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/r4b.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/r4b.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/r4b.log
    fi
}

# Wait (max 2.5 h) for the boot chain to release the chip.
for i in $(seq 1 300); do
    if [ -f /tmp/r4boot.pid ] && kill -0 "$(cat /tmp/r4boot.pid)" 2>/dev/null; then
        sleep 30
    else
        break
    fi
done

run adapt-hybrid-cr   timeout 5400 ./scripts/train-adaptive-nets hybrid-cr-dynkcpt --precision bf16
run adapt-synth-ac    timeout 5400 ./scripts/train-adaptive-nets synth-ac-dynkcpt --precision bf16
run archive-1         python tools/archive_results.py --include-checkpoints
run frontier-pass1    timeout 5400 python tools/serving_frontier.py --json nets/campaign-logs/serving-frontier-pass1.json
run frontier-warm     timeout 3600 python tools/serving_frontier.py --json nets/campaign-logs/serving-frontier-warm.json
run adapt-synth-ac-tree timeout 7200 ./scripts/train-adaptive-nets synth-ac-tree-dynkcpt --precision bf16 --stacked-tails
run archive-2         python tools/archive_results.py --include-checkpoints
run frontier-tree     timeout 7200 python tools/serving_frontier.py \
    --checkpoint nets/hybrid-ac-tree-dynkcpt/net.npy \
    --json nets/campaign-logs/serving-frontier-tree.json \
    --out figures/serving-frontier-tree.svg
run figs-acc-eff      timeout 1800 ./scripts/make-acc-eff-plots
run figs-pres         timeout 1800 ./scripts/make-pres-figs
run archive-3         python tools/archive_results.py --include-checkpoints
echo "=== r4b chain done ===" | tee -a nets/campaign-logs/r4b.log
