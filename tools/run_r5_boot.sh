#!/bin/bash
# Round-5 fresh-VM boot chain.
#
# Changes vs run_r4_boot.sh (VERDICT r4 next #1 — the r4 MULTICHIP
# rc=124 postmortem): the XLA:CPU compile cache prewarm is now GATED on
# a fresh-subprocess loadability probe, and validated the way the
# driver will use it. On the r4 VM generation, AOT artifacts written by
# one process were REJECTED by the next (cpu_aot_loader machine-feature
# mismatch), so the prewarm made the driver's run strictly slower —
# cold recompile behind rejection spam, into a timeout. Now:
#   1. bench.py once — warms the flagship sweep + infer programs into
#      .jax_cache (TPU side) and records the end-to-end artifact.
#   2. cache probe (fresh writer + reader subprocesses): only if
#      artifacts provably load cross-process do we spend ~30 min
#      prewarming the FULL dryrun programs (MPNN_DRYRUN_PREWARM=1);
#      otherwise the prewarm is skipped — the driver's dryrun then
#      runs its reduced-depth cold plan, which completes in minutes
#      without any cache. Probe evidence is appended to the COMMITTED
#      results/multichip/dryrun-probe.log either way.
#   3. dryrun-validate: a fresh subprocess runs dryrun_multichip(8)
#      exactly like the driver (no env knobs) under a 900 s timeout.
#      This is the go/no-go artifact: rc=0 here means MULTICHIP_r5
#      passes regardless of cache state.
#
# Near round end: `python tools/idle_chip.py` stops recorded background
# pids and verifies the chip answers, so the driver's bench window is
# uncontended.
set -u
cd "$(dirname "$0")/.."
mkdir -p nets/campaign-logs results/multichip
echo $$ > /tmp/r5boot.pid
run() {
    name="$1"; shift
    echo "=== $(date -u +%H:%M:%S) start $name" | tee -a nets/campaign-logs/boot-r5.log
    "$@" > "nets/campaign-logs/$name.log" 2>&1
    rc=$?
    echo "=== $(date -u +%H:%M:%S) done  $name rc=$rc" | tee -a nets/campaign-logs/boot-r5.log
    if [ $rc -ne 0 ]; then
        tail -20 "nets/campaign-logs/$name.log"
        echo "FAILURES: $name rc=$rc" | tee -a nets/campaign-logs/boot-r5.log
    fi
    return $rc
}
# Wait for prep-data to finish hybrid.npz (bench's routed half needs it;
# prep runs in parallel with the restore step).
for i in $(seq 1 120); do
    [ -f data/hybrid.npz ] && break
    sleep 10
done
run bench-warm timeout 5400 python bench.py

probe() {
    python - <<'EOF'
import __graft_entry__ as g
ok, detail = g._probe_cpu_cache(g.CPU_CACHE, 8)
raise SystemExit(0 if ok else 1)
EOF
}
if run cache-probe probe; then
    run dryrun-prewarm env MPNN_DRYRUN_PREWARM=1 timeout 3600 \
        python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
else
    echo "=== cache not cross-process loadable; prewarm skipped (driver will run the cold reduced plan)" \
        | tee -a nets/campaign-logs/boot-r5.log
fi
# Driver-exact validation: fresh subprocess, no env knobs, hard budget.
run dryrun-validate timeout 900 \
    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
cp nets/campaign-logs/dryrun-validate.log results/multichip/dryrun-validate-latest.log 2>/dev/null
echo "=== r5 boot chain done ===" | tee -a nets/campaign-logs/boot-r5.log
