#!/bin/bash
# Wait for the axon TPU backend to come back (tunnel outages observed
# 2026-08-17: init hangs minutes then raises UNAVAILABLE), then run the
# packed-carry measurements back to back on the one chip.
cd "$(dirname "$0")/.."
for i in $(seq 1 60); do
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
