#!/bin/bash
# Round-4 on-chip perf measurements (VERDICT r3 next #3-5 + weak #7).
# Waits for the width campaign to release the chip, then runs:
#   1. bench.py — warms the NEW infer programs (forced-exit counters
#      changed the HLO; the driver's BENCH_r04 then hits a warm cache)
#      and records the capacity-sweep numbers on-chip.
#   2. tpu_router_batch.py — the shape-grouped pad-free arm A/B.
#   3. tpu_roofline.py — traffic-vs-measured account for chain + tree
#      sweeps (three fresh remote compiles; the long pole).
#   4. dryrun_multichip again — verifies the same-VM /tmp CPU cache
#      turns the ~15-min compile into seconds.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/perf-r4.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/perf-r4.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/perf-r4.log
    fi
}

# Self-register for tools/idle_chip.py (see run_r4_boot.sh note).
echo $$ > /tmp/r4perf.pid

# Wait (max 4 h) for the width campaign to release the chip. Gate on the
# campaign PROCESS (pidfile liveness), not a log marker: campaign.log is
# archived into results/ and restored on fresh VMs, so its done-marker
# from a PRIOR run is permanently present and a marker grep would open
# the gate instantly, running this chip-heavy chain concurrently with
# the training it must wait for.
for i in $(seq 1 480); do
    if [ -f /tmp/r4campaign.pid ] && kill -0 "$(cat /tmp/r4campaign.pid)" 2>/dev/null; then
        sleep 30
    else
        break
    fi
done

run bench-r4        timeout 7200 python bench.py
run router-grouped  timeout 3600 python tools/tpu_router_batch.py
run roofline        timeout 10800 python tools/tpu_roofline.py --configs chain,tree,tree-stacked
run dryrun-warm     timeout 3600 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "=== r4 perf chain done ===" | tee -a nets/campaign-logs/perf-r4.log
