#!/bin/bash
# Round-5 serving-frontier re-measure (VERDICT r4 next #2/#3/#8 +
# ADVICE r4): new timing protocol (compile all -> throwaway warm window
# per program -> rotated median-of-passes), per-price dense cross-check
# + per-leaf breakdowns, and b1/b8 latency on the chain adaptive.
# Waits for the CR-probe chain (same chip) first; run_r5_width.sh waits
# for this.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs results/serving-frontier
echo $$ > /tmp/r5frontier.pid
# Launch-order contract: start predecessor chains FIRST (each writes its
# pidfile at startup); this grace sleep tolerates near-simultaneous
# launches where a predecessor has not written its pidfile yet.
sleep 90
while [ -f /tmp/r5crprobe.pid ] && kill -0 "$(cat /tmp/r5crprobe.pid)" 2>/dev/null; do
    sleep 60
done
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/frontier-r5.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/frontier-r5.log
    [ $rc -ne 0 ] && tail -15 "nets/campaign-logs/$name.log"
    return $rc
}
run frontier-chain-r5 timeout 7200 python tools/serving_frontier.py \
    --checkpoint nets/hybrid-ac-dynkcpt/net.npy \
    --json results/serving-frontier/chain-frontier-r5.json \
    --latency-prices min,max \
    --out figures/serving-frontier.svg
run frontier-tree-r5 timeout 7200 python tools/serving_frontier.py \
    --checkpoint nets/hybrid-ac-tree-dynkcpt/net.npy \
    --json results/serving-frontier/tree-frontier-r5.json \
    --out figures/serving-frontier-tree.svg
echo "=== r5 frontier chain done ===" | tee -a nets/campaign-logs/frontier-r5.log
