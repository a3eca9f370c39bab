#!/bin/bash
# Post-backfill round-4 chain: once run_r4_adaptives.sh releases the
# chip, (1) re-measure the serving frontier on a fully warm cache
# (replaces the two cold-process timing artifacts in the first run),
# (2) attempt the frontier on the adaptive TREE net (arbitrary-topology
# engine demo; bounded — its ~6 infer programs are cold compiles),
# (3) refresh the figure panels that consume adaptive stats (the
# backfill rewrote those trajectories), (4) archive.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
echo $$ > /tmp/r4post.pid

run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/post-r4.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/post-r4.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/post-r4.log
    fi
}

# Gate on the backfill queue's pidfile (max 3 h).
for i in $(seq 1 360); do
    if [ -f /tmp/r4adapt.pid ] && kill -0 "$(cat /tmp/r4adapt.pid)" 2>/dev/null; then
        sleep 30
    else
        break
    fi
done

run frontier-warm  timeout 3600 python tools/serving_frontier.py --json nets/campaign-logs/serving-frontier-warm.json
run frontier-tree  timeout 5400 python tools/serving_frontier.py \
    --checkpoint nets/hybrid-ac-tree-dynkcpt/net.npy \
    --json nets/campaign-logs/serving-frontier-tree.json \
    --out figures/serving-frontier-tree.svg
run figs-acc-eff   timeout 1800 ./scripts/make-acc-eff-plots
run figs-pres      timeout 1800 ./scripts/make-pres-figs
run post-archive   python tools/archive_results.py --include-checkpoints
echo "=== r4 post chain done ===" | tee -a nets/campaign-logs/post-r4.log
