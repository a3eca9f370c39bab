#!/bin/bash
# Wait for the axon TPU backend to come back (tunnel outages observed
# 2026-08-17/18: init hangs minutes then raises UNAVAILABLE), then run the
# queued packed-carry measurements back to back on the one chip.
# v2: patient ping budget (the first outage outlived the 60-ping budget),
# plus a plain bench.py sanity pass at the end.
cd "$(dirname "$0")/.."
for i in $(seq 1 400); do
  if timeout 300 python - <<'EOF'
import jax, numpy as np
import jax.numpy as jnp
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print("tpu OK", jax.devices())
EOF
  then break; fi
  echo "=== tpu ping $i failed, sleeping 120s ==="
  sleep 120
done
echo "=== chain sweep packed (MPNN_BENCH_STACKED=1 bench.py) ==="
MPNN_BENCH_STACKED=1 timeout 3600 python bench.py
echo "=== tree bench x1,x8 stacked+packed ==="
timeout 7200 python tools/tpu_tree_bench.py --widths 1,8 --stacked --chunk 50 --n-chunks 3
echo "=== plain bench.py (round-artifact sanity, post-eps-fix) ==="
timeout 3600 python bench.py
echo "=== wait_and_bench v2 done ==="
