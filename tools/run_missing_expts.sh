#!/bin/bash
# Train the two registry extensions that have no campaign outputs yet
# (cifar10-cr sweep, mnist-sr depth ladder) at the FULL reference budget
# on the single chip. Waits for the wait-and-bench watcher (pid in
# /tmp/wab.pid) to finish first so the packed-carry measurements keep the
# chip to themselves. Resumable like the main campaign.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs

wab=$(cat /tmp/wab.pid 2>/dev/null || true)
while [ -n "$wab" ] && kill -0 "$wab" 2>/dev/null; do
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

run cifar10-cr timeout 14400 ./scripts/train-nets cifar10-cr --resume --vmap-sweep --precision bf16 --analytic-l2
run mnist-sr   timeout 14400 ./scripts/train-nets mnist-sr --resume --precision bf16 --analytic-l2
echo "=== run_missing_expts done ==="
