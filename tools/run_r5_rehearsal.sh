#!/bin/bash
# Fresh-clone rehearsal (VERDICT r4 next #4 "Done" criterion): clone the
# repo to a scratch dir, restore from the committed results/ snapshots
# alone, and prove that (a) width acc-eff panels render and (b) a FAT
# final checkpoint — reassembled from its compact .cz shards — loads
# through read_net and evaluates, with zero retraining. CPU-only.
set -eu
cd "$(dirname "$0")/.."
SRC=$(pwd)
CLONE=${1:-/tmp/r5-rehearsal}
rm -rf "$CLONE"
git clone -q "$SRC" "$CLONE"
cd "$CLONE"
./scripts/prep-data --synthetic --small --data-dir data > /dev/null
python tools/archive_results.py --restore
ls nets/cifar10-ac-fat/*.npy >/dev/null 2>&1 || {
    echo "REHEARSAL FAIL: no fat checkpoints restored"; exit 1; }
python - <<'EOF'
import glob, sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from mpnn_tpu.utils.serdes import read_net
from mpnn_tpu.models.net import Ctx

# A fat (width-2) final reassembled from compact shards: load + eval.
ckpts = sorted(glob.glob("nets/cifar10-ac-fat/000?.npy"))
assert ckpts, "no fat checkpoints"
net, params, state, extra = read_net(ckpts[len(ckpts) // 2])
print(f"loaded {ckpts[len(ckpts) // 2]}: t={int(extra['t'])}, "
      f"{sum(1 for _ in net.layers)} nodes")
B = 16
x0 = jnp.asarray(np.random.RandomState(0)
                 .rand(B, *net.hypers.x0_shape).astype(np.float32))
y = jnp.zeros((B,) + tuple(net.hypers.y_shape), jnp.float32)
ctx = Ctx(train=False, rng=None, tau=1.0, eps=1e-6,
          k_cpt=getattr(net.hypers, "k_cpt", 0.0))
recs, _ = net.forward(params, state, x0, y, ctx)
leaves = [np.asarray(r.x) for r in recs.values()
          if hasattr(r.x, "ndim") and r.x.ndim == 2 and r.x.shape[1] == 10]
assert leaves and all(np.isfinite(l).all() for l in leaves)
print(f"fat checkpoint evaluates: {len(leaves)} exit heads, "
      f"probs finite, row sums ~1: "
      f"{np.allclose(sum(l.sum(1).mean() for l in leaves[:1]), 1, atol=1e-3)}")
EOF
./scripts/make-acc-eff-plots > /dev/null
ls figures/acc-eff-*.pdf | head -3
echo "REHEARSAL OK: width panels rendered + fat final re-evaluated from snapshots alone"
