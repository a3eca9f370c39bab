#!/bin/bash
# Tail of the session-2 queue, reordered: the patched multi-pass chain
# frontier (10-15 min, all programs warm — produces the clean ledger
# artifact) runs BEFORE the tree frontier (cold tree-infer compiles,
# potentially 1-2 h), so a round-end cutoff costs the optional item,
# not the ledger one. Evidence JSONs are copied into results/ (the
# nets/campaign-logs/ originals die with the VM — only campaign.log is
# archived).
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs results/serving-frontier
echo $$ > /tmp/r4btail.pid

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

run frontier-final timeout 3600 python tools/serving_frontier.py \
    --json results/serving-frontier/chain-frontier-r4.json
run frontier-tree  timeout 7200 python tools/serving_frontier.py \
    --checkpoint nets/hybrid-ac-tree-dynkcpt/net.npy \
    --json results/serving-frontier/tree-frontier-r4.json \
    --out figures/serving-frontier-tree.svg
run figs-acc-eff   timeout 1800 ./scripts/make-acc-eff-plots
run figs-pres      timeout 1800 ./scripts/make-pres-figs
run archive-final  python tools/archive_results.py --include-checkpoints
echo "=== r4b tail done ===" | tee -a nets/campaign-logs/r4b.log
