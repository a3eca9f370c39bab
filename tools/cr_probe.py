#!/usr/bin/env python3
"""Why is the adaptive critic (hybrid-cr-dynkcpt) price-INSENSITIVE?

VERDICT r4 next #5: the trained hybrid-cr-dynkcpt chain is flat across
the 8 deployment prices (acc .0465-.0470, moc 3.83-3.87e6) while its
actor twin spans the whole frontier. This probe pins the mechanism in
three steps:

1. --weights (CPU, seconds): per-switch router first-dense weights —
   RMS of the price COLUMN's row vs the RMS of the activation rows, and
   the implied pre-activation swing alpha_cpt * max(k_cpt) * |w_price|
   vs the total activation-driven scale. A near-zero price row means
   the router LEARNED to ignore the price feature (the regression
   target's conditional mean explanation), not that it cannot see it.

2. --route (chip or CPU): per-price exit histograms via the routed
   engine at capacity 1.0 (exact dense hard routing) — does routing
   change with price AT ALL?

3. Hypothesis context (reference net_types.py:232-235): the critic's
   regression target c_ev ALREADY contains k_cpt * ops directly, so a
   router that ignores the price input fits the price-AVERAGED
   cost-to-go — which is exactly price-insensitive routing. The actor
   has no such average-target shortcut: its REINFORCE-style loss
   rewards price-conditional routing per sampled example. If (1) shows
   a dead price row and (2) shows flat routing, the mechanistic
   explanation is pinned; a frontier-spanning CR then needs the price
   signal amplified (--alpha-cpt on train-adaptive-nets) or the
   shortcut removed.

Usage:
  python tools/cr_probe.py --weights [--checkpoint nets/hybrid-cr-dynkcpt/net.npy]
  python tools/cr_probe.py --route [--platform cpu] [--batch-size 512]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def weight_report(ckpt):
    from mpnn_tpu.utils.serdes import read_net
    net, params, state, _ = read_net(ckpt)
    if not getattr(net.hypers, "dyn_k_cpt", False):
        raise SystemExit(f"{ckpt} is not a dyn_k_cpt net")
    from mpnn_tpu.experiments import k_cpts
    α_cpt = float(getattr(net.hypers, "α_cpt", 1e7))
    k_max = float(max(k_cpts))  # top of the deployment price sweep
    rows = []

    def walk(node, p):
        if node.router is not None:
            # Router chain: [Select, LinTrans, BN, Rect, LinTrans, BN,
            # Rect, LinTrans]; first LinTrans is comps[1].
            w = np.asarray(p["router"]["comps"][1]["w"], np.float64)
            w_price = w[-1]          # the appended price column's row
            w_act = w[:-1]
            rms_p = float(np.sqrt(np.mean(w_price ** 2)))
            rms_a = float(np.sqrt(np.mean(w_act ** 2)))
            # Pre-activation swing the price can cause across the sweep
            # vs a rough activation-driven scale (unit-RMS activations).
            swing = α_cpt * k_max * float(np.abs(w_price).max())
            act_scale = float(np.sqrt((w_act ** 2).sum(0).mean()))
            rows.append({
                "switch": node.name, "fan_in": int(w.shape[0] - 1),
                "rms_price_row": rms_p, "rms_act_rows": rms_a,
                "price_to_act_rms": rms_p / rms_a if rms_a else None,
                "max_price_swing": swing,
                "act_preact_scale": act_scale,
                "swing_to_act": swing / act_scale if act_scale else None,
            })
        for i, s in enumerate(node.sinks):
            walk(s, p["sinks"][i])

    walk(net.root, params)
    return {"checkpoint": os.path.relpath(ckpt, REPO), "alpha_cpt": α_cpt,
            "k_max": k_max, "switches": rows}


def route_report(ckpt, platform, batch_size, data):
    import jax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable(platform=platform)
    if platform:
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    from mpnn_tpu.utils.serdes import read_net
    from mpnn_tpu.models.infer import make_routed_infer_fn
    from mpnn_tpu.experiments import k_cpts
    from mpnn_tpu.data import Dataset

    net, params, state, _ = read_net(ckpt)
    ds = Dataset(data, device_put=False)
    B = batch_size
    reps = -(-B // len(ds.x0_ts))
    x0 = jnp.asarray(np.tile(ds.x0_ts, (reps, 1, 1, 1))[:B])
    y_cls = np.argmax(np.tile(np.asarray(ds.y_ts), (reps, 1))[:B], axis=1)
    n_leaves = sum(1 for l in net.layers if len(l.sinks) == 0)
    infer = make_routed_infer_fn(net, B, capacities=1.0)
    out = {"checkpoint": os.path.relpath(ckpt, REPO), "batch_size": B,
           "prices": []}
    base = None
    for price in k_cpts:
        r = infer(params, state, x0, price)
        exit_idx = np.asarray(r["exit_idx"])
        pred = np.argmax(np.asarray(r["probs"]), axis=1)
        hist = [int((exit_idx == i).sum()) for i in range(n_leaves)]
        if base is None:
            base = exit_idx
        out["prices"].append({
            "k_cpt": price, "exit_hist": hist,
            "mean_ops": float(np.asarray(r["ops"]).mean()),
            "accuracy": round(float(np.mean(pred == y_cls)), 4),
            "n_routed_differently_vs_k0": int((exit_idx != base).sum()),
        })
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint",
                    default=os.path.join(REPO, "nets", "hybrid-cr-dynkcpt",
                                         "net.npy"))
    ap.add_argument("--data", default=os.path.join(REPO, "data",
                                                   "hybrid.npz"))
    ap.add_argument("--weights", action="store_true")
    ap.add_argument("--route", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    out = {}
    if args.weights:
        out["weights"] = weight_report(args.checkpoint)
    if args.route:
        out["route"] = route_report(args.checkpoint, args.platform,
                                    args.batch_size, args.data)
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
