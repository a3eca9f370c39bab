#!/bin/bash
# Round-5 finale: frontier-spanning adaptive critic at the full budget
# (VERDICT r4 next #5 "either a frontier-spanning CR config or a pinned
# mechanistic explanation" — this delivers BOTH: the mechanism is
# pinned in docs/results-r5.md §3, and the α_cpt=1e9 config the 10k
# probes identified trains here at the reference 80k budget on hybrid,
# with per-price routing histograms + per-price stats as evidence).
# Runs after the width chain (chip serialization).
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs results
echo $$ > /tmp/r5cr80k.pid
# Launch-order contract: start predecessor chains FIRST (each writes its
# pidfile at startup); this grace sleep tolerates near-simultaneous
# launches where a predecessor has not written its pidfile yet.
sleep 90
for pidfile in /tmp/r5crprobe.pid /tmp/r5frontier.pid /tmp/r5width.pid; do
    while [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; do
        sleep 60
    done
done
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/cr80k-r5.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/cr80k-r5.log
    [ $rc -ne 0 ] && tail -15 "nets/campaign-logs/$name.log"
    return $rc
}
run train-hybrid-cr-acpt1e9 timeout 7200 ./scripts/train-adaptive-nets \
    hybrid-cr-dynkcpt-acpt1e9 --stats-log
run route-hybrid-cr-acpt1e9 timeout 3600 python tools/cr_probe.py --route \
    --checkpoint nets/hybrid-cr-dynkcpt-acpt1e9/net.npy \
    --data data/hybrid.npz --batch-size 1024 \
    --json results/cr-probe-hybrid-cr-dynkcpt-acpt1e9.json
run ckpt-archive python tools/archive_results.py --include-checkpoints
echo "=== r5 cr80k chain done ===" | tee -a nets/campaign-logs/cr80k-r5.log
