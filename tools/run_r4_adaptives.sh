#!/bin/bash
# Backfill durable checkpoints for the 5 adaptive experiments whose
# net.npy died with earlier VMs (stats survived; checkpoints did not —
# VERDICT r3 weak #1 named "flagship + adaptives" as the durable set,
# and hybrid-ac-dynkcpt was re-created 2026-08-20). Trees run
# --stacked-tails (28% faster single-net steps, validated at 80k in r2).
# Waits for /tmp/frontier.pid to release the chip, then trains each at
# the full reference budget and archives the finals into results/.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
echo $$ > /tmp/r4adapt.pid

run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/adaptives-r4.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/adaptives-r4.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/adaptives-r4.log
    fi
}

# Wait (max 2 h) for the serving-frontier run to release the chip.
for i in $(seq 1 240); do
    if [ -f /tmp/frontier.pid ] && kill -0 "$(cat /tmp/frontier.pid)" 2>/dev/null; then
        sleep 30
    else
        break
    fi
done

run adapt-hybrid-cr        timeout 5400 ./scripts/train-adaptive-nets hybrid-cr-dynkcpt --precision bf16
run adapt-synth-ac         timeout 5400 ./scripts/train-adaptive-nets synth-ac-dynkcpt --precision bf16
run adapt-hybrid-ac-tree   timeout 7200 ./scripts/train-adaptive-nets hybrid-ac-tree-dynkcpt --precision bf16 --stacked-tails
run adapt-hybrid-cr-tree   timeout 7200 ./scripts/train-adaptive-nets hybrid-cr-tree-dynkcpt --precision bf16 --stacked-tails
run adapt-synth-ac-tree    timeout 7200 ./scripts/train-adaptive-nets synth-ac-tree-dynkcpt --precision bf16 --stacked-tails
run adapt-archive          python tools/archive_results.py --include-checkpoints
echo "=== r4 adaptive backfill done ===" | tee -a nets/campaign-logs/adaptives-r4.log
