"""Descriptor (statistics snapshot) engine + text rendering.

Produces the exact nested-dict schema the reference's five figure scripts
consume (reference scripts/lib/desc.py:24-36):

    {'type': <net class name>, 'stats_tr': {...}, 'stats_ts': {...},
     'root': {'name': ..., 'stats_tr': {...}, 'stats_ts': {...},
              'sinks': [<same shape>...]}}

with scalar stats as Python floats and per-class stats as lists
(`.tolist()`, reference scripts/lib/desc.py:22). Sink ORDER is semantic --
make-routing-hists walks sinks[0]/sinks[1] positionally
(scripts/make-routing-hists:19-27).

Unlike the reference's per-batch Session.run sweep (desc.py:10-22), stats
come from one jitted lax.scan over each padded split
(mpnn_tpu.models.steps.make_eval_split_fn); the sum/count math is identical.

The text rendering (render_net_desc / render_layer_desc) reproduces the
reference's box-drawing log format byte-for-byte (scripts/lib/desc.py:42-79)
since the appended -log.txt files are part of the observable output
contract."""

import numpy as np

from ..models.steps import make_eval_split_fn

__all__ = ["net_desc", "render_net_desc", "mean_split_stats",
           "sweep_net_descs"]


def mean_split_stats(net, eval_split, params, state, dataset, split,
                     batch_size=128, tau=None, k_cpt=None, eval_key=None):
    """Dataset-mean stats for one split: {stat_key: float | list}.

    eval_key seeds per-batch dropout noise for nets with keep-prob < 1
    (callers pass fold_in(seed, t) so repeated evals draw fresh masks);
    ignored -- a leafless None pytree -- for dropout-free nets."""
    x0s, ys, masks, count = dataset.padded_split(split, batch_size)
    if tau is None:
        tau = float(getattr(net.hypers, "τ", 1.0))
    if k_cpt is None:
        k_cpt = getattr(net.hypers, "k_cpt", 0.0)
    sums = eval_split(params, state, x0s, ys, masks, tau, k_cpt, eval_key)
    return {k: (np.asarray(v) / count).tolist() for k, v in sums.items()}


def _layer_desc(layer, stats_tr, stats_ts):
    """Per-layer descriptor node (reference scripts/lib/desc.py:24-29)."""
    prefix = f"{layer._uid}/"
    return {
        "name": layer.name,
        "stats_tr": {k[len(prefix):]: v for k, v in stats_tr.items()
                     if k.startswith(prefix)},
        "stats_ts": {k[len(prefix):]: v for k, v in stats_ts.items()
                     if k.startswith(prefix)},
        "sinks": [_layer_desc(s, stats_tr, stats_ts) for s in layer.sinks],
    }


def net_desc(net, dataset, params, state, batch_size=128, tau=None,
             k_cpt=None, eval_split=None, eval_key=None):
    """Full-network descriptor over both splits
    (reference scripts/lib/desc.py:31-36)."""
    if eval_split is None:
        eval_split = make_eval_split_fn(net, batch_size)
    stats_tr = mean_split_stats(net, eval_split, params, state, dataset,
                                "tr", batch_size, tau, k_cpt, eval_key)
    stats_ts = mean_split_stats(net, eval_split, params, state, dataset,
                                "ts", batch_size, tau, k_cpt, eval_key)
    net_keys = lambda d: {k[len("net/"):]: v for k, v in d.items()
                          if k.startswith("net/")}
    return {
        "type": type(net).__name__,
        "stats_tr": net_keys(stats_tr),
        "stats_ts": net_keys(stats_ts),
        "root": _layer_desc(net.root, stats_tr, stats_ts),
    }


def sweep_net_descs(net, dataset, params_s, state_s, k_cpts, *,
                    batch_size=128, tau=None, eval_split=None,
                    eval_key=None):
    """Per-net descriptors for a whole k_cpt sweep in ONE vmapped pass per
    split (mpnn_tpu.models.steps.make_sweep_eval_split_fn). Each returned
    dict is schema-identical to net_desc's."""
    import jax.numpy as jnp
    from ..models.steps import make_sweep_eval_split_fn
    if eval_split is None:
        eval_split = make_sweep_eval_split_fn(net, batch_size)
    if tau is None:
        tau = float(getattr(net.hypers, "τ", 1.0))
    k_arr = jnp.asarray(list(k_cpts), jnp.float32)
    split_means = {}
    for split in ("tr", "ts"):
        x0s, ys, masks, count = dataset.padded_split(split, batch_size)
        sums = eval_split(params_s, state_s, x0s, ys, masks, tau, k_arr,
                          eval_key)
        split_means[split] = {k: np.asarray(v) / count
                              for k, v in sums.items()}
    net_keys = lambda d: {k[len("net/"):]: v for k, v in d.items()
                          if k.startswith("net/")}
    descs = []
    for i in range(len(k_cpts)):
        stats_tr = {k: v[i].tolist() for k, v in split_means["tr"].items()}
        stats_ts = {k: v[i].tolist() for k, v in split_means["ts"].items()}
        descs.append({
            "type": type(net).__name__,
            "stats_tr": net_keys(stats_tr),
            "stats_ts": net_keys(stats_ts),
            "root": _layer_desc(net.root, stats_tr, stats_ts),
        })
    return descs


################################################################################
# Rendering (format contract: reference scripts/lib/desc.py:42-79)
################################################################################

def render_stats(stats):
    return (
        "(%s)" % "; ".join(
            "%s=%.3g" % i
            for i in sorted(stats.items())
            if np.ndim(i[1]) == 0)
        if len(stats) > 0 else "")


def render_layer_desc(desc, stats_key):
    sink_text = "".join(
        "\n↳ " + render_layer_desc(s, stats_key).replace(
            "\n", "\n| " if i < len(desc["sinks"]) - 1 else "\n  ")
        for i, s in enumerate(desc["sinks"]))
    return "%s %s%s" % (desc["name"], render_stats(desc[stats_key]),
                        sink_text)


def render_net_desc(desc, name="Network"):
    return (
        "┌───────────────────────────────────────────────────────────\n"
        "│ {name}\n"
        "├───────────────────────────────────────────────────────────\n"
        "│ Training Set:\n"
        "│\n"
        "│   [{net_type}] {net_stats_tr}\n"
        "│     {layers_tr}\n"
        "│\n"
        "│ Test Set:\n"
        "│\n"
        "│   [{net_type}] {net_stats_ts}\n"
        "│     {layers_ts}\n"
        "│").format(
            name=name,
            net_type=desc["type"],
            net_stats_tr=render_stats(desc["stats_tr"]),
            net_stats_ts=render_stats(desc["stats_ts"]),
            layers_tr=render_layer_desc(desc["root"], "stats_tr")
                      .replace("\n", "\n│     "),
            layers_ts=render_layer_desc(desc["root"], "stats_ts")
                      .replace("\n", "\n│     "))
