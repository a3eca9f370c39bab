#!/bin/bash
# Round-5 width-ladder retrain for DURABLE finals (VERDICT r4 next #4).
#
# The fat (~22 MB) / fatter (~46-90 MB) finals died with every microVM
# because they exceeded the archive's 8 MB per-file cap. The archive now
# stores oversized checkpoints as bf16+zlib sharded '.cz' dirs
# (serdes.write_compact) and --restore reassembles them, so this round's
# retrains are the LAST ones a fresh VM ever needs: after each
# experiment completes, `archive_results --include-checkpoints` makes
# its finals durable. Waits for the CR-probe chain (same chip) first.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
echo $$ > /tmp/r5width.pid
# Serialize on the chip: wait for the crprobe + frontier chains.
# Launch-order contract: start predecessor chains FIRST (each writes its
# pidfile at startup); this grace sleep tolerates near-simultaneous
# launches where a predecessor has not written its pidfile yet.
sleep 90
for pidfile in /tmp/r5crprobe.pid /tmp/r5frontier.pid; do
    while [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; do
        sleep 60
    done
done
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/width-r5.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/width-r5.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/width-r5.log
    fi
    return $rc
}
WS="--n-iter 80000 --precision bf16 --analytic-l2"
# timeout = hang insurance (see run_r4_campaign.sh: a tunnel outage once
# hung an eval RPC 49 min; runs are resumable so a bounded kill loses
# nothing).
run cifar10-sr-fat-80k    timeout 7200 ./scripts/train-nets cifar10-sr-fat --resume $WS
run ckpt-archive-srfat    python tools/archive_results.py --include-checkpoints
run cifar10-ac-fat-80k    timeout 7200 ./scripts/train-nets cifar10-ac-fat --resume --vmap-sweep $WS
run ckpt-archive-acfat    python tools/archive_results.py --include-checkpoints
run cifar10-sr-fatter-80k timeout 7200 ./scripts/train-nets cifar10-sr-fatter --resume $WS
run ckpt-archive-srfatter python tools/archive_results.py --include-checkpoints
run cifar10-ac-fatter-80k timeout 7200 ./scripts/train-nets cifar10-ac-fatter --resume --vmap-sweep $WS
run retry-width python tools/retrain_diverged.py cifar10-sr-fat cifar10-ac-fat cifar10-sr-fatter cifar10-ac-fatter
run ckpt-archive-final    python tools/archive_results.py --include-checkpoints
run summary bash -c 'python tools/summarize_campaign.py > docs/campaign-summary.md'
echo "=== r5 width chain done ===" | tee -a nets/campaign-logs/width-r5.log
