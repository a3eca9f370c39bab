"""Checkpoint serialization: the reference's self-describing whole-model
format, plus optimizer state for true resume.

Format (reference scripts/lib/serdes.py:13-19, 40-44): a single `.npy`
pickled nested dict; each layer record is

    {'type': <class name>, 'name': ..., 'hypers': {...},
     'params': {name: ndarray, ...}, 'sinks': [...], 'comps': [...],
     'router': <record or None>}

and the net record is {'type', 'root', 'hypers', 'params'}. The architecture
is rebuildable from the file alone (reference scripts/lib/serdes.py:21-26).
BatchNorm's running stats live under 'params' like the reference's
non-trainable variables (m_avg / v_avg, scripts/lib/layer_types.py:226-227)
even though at runtime they are state, not trainable params.

Extension over the reference (SURVEY.md section 5 "checkpoint/resume"): an
optional top-level 'extra' dict carrying {'vel': <momentum pytree>, 't':
step} so training resumes exactly; readers of the reference schema ignore
it.

Reference-written records import directly: class names, hyper names and
parameter names ('w', 'b', 'w_horz_i', 'γ', 'm_avg', ...) are shared
byte-for-byte, 'extra' is optional, and raw (non-NFKC) unicode hyper keys
such as 'ϵ' U+03F5 are normalized at Layer/Net construction
(tests/test_reference_import.py). NOTE the numerical caveat: reference-
TRAINED parameters only evaluate correctly under the TF1 pyramid grid --
run with --pyramid-tf1 / ops.config.set_pyramid_tf1(True) (PARITY.md)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as layer_lib
from .. import models as net_lib

__all__ = ["encode_net", "decode_net", "write_net", "read_net",
           "atomic_save"]


def atomic_save(path, obj):
    """np.save via tmp-file + os.replace so a crash or kill mid-write can
    never leave a torn file. Checkpoints are read back by --resume and
    stats files by the figure scripts; both must survive a process dying
    at any instant (e.g. the campaign runner being killed at a round
    boundary). POSIX rename within a directory is atomic."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.save(f, obj)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)

# Parameter names that are runtime *state* rather than trainable params
# (BatchNorm EMA stats; the only stateful layer family in the zoo).
STATE_KEYS = frozenset({"m_avg", "v_avg"})


def _to_np(tree):
    # One tree-level device_get: transfers of all leaves start async and
    # overlap, instead of one blocking round trip per leaf (the tunneled
    # runtime's per-transfer latency made per-leaf pulls dominate
    # checkpoint writes).
    return jax.tree.map(np.asarray, jax.device_get(tree))


################################################################################
# Encode
################################################################################

def _encode_layer(layer, params, state):
    if layer is None:
        return None
    merged = {k: np.asarray(jax.device_get(v))
              for k, v in params.items() if k != "comps"}
    merged.update({k: np.asarray(jax.device_get(v))
                   for k, v in state.items() if k != "comps"})
    comp_params = params.get("comps", [{}] * len(layer.comps))
    comp_state = state.get("comps", [{}] * len(layer.comps))
    return dict(
        type=type(layer).__name__,
        name=layer.name,
        hypers=dict(vars(layer.hypers)),
        params=merged,
        sinks=[],
        comps=[_encode_layer(c, cp, cs)
               for c, cp, cs in zip(layer.comps, comp_params, comp_state)],
        router=None,
    )


def _encode_node(node, node_params, node_state):
    rec = _encode_layer(node, node_params["layer"], node_state["layer"])
    if node.router is not None:
        rec["router"] = _encode_layer(node.router, node_params["router"],
                                      node_state["router"])
    rec["sinks"] = [
        _encode_node(s, node_params["sinks"][i], node_state["sinks"][i])
        for i, s in enumerate(node.sinks)]
    return rec


def encode_net(net, params, state, extra=None):
    # Pull everything to host in ONE overlapped transfer before the
    # per-layer recursion (whose per-leaf device_gets then become no-ops).
    params, state = jax.device_get((params, state))
    rec = dict(
        type=type(net).__name__,
        root=_encode_node(net.root, params, state),
        hypers=dict(vars(net.hypers)),
        params={},  # net-level params: always empty (parity with reference)
    )
    if extra is not None:
        rec["extra"] = _to_np(extra)
    return rec


################################################################################
# Decode
################################################################################

def _decode_layer_obj(rec):
    if rec is None:
        return None
    cls = getattr(layer_lib, rec["type"])
    return cls(
        name=rec["name"],
        router=_decode_layer_obj(rec["router"]),
        sinks=[_decode_layer_obj(r) for r in rec["sinks"]],
        comps=[_decode_layer_obj(r) for r in rec["comps"]],
        **{k: v for k, v in rec["hypers"].items()})


def _layer_params_from_record(layer, rec):
    p = {k: jnp.asarray(v) for k, v in rec["params"].items()
         if k not in STATE_KEYS}
    s = {k: jnp.asarray(v) for k, v in rec["params"].items()
         if k in STATE_KEYS}
    if layer.comps:
        pc, sc = [], []
        for comp, crec in zip(layer.comps, rec["comps"]):
            cp, cs = _layer_params_from_record(comp, crec)
            pc.append(cp)
            sc.append(cs)
        p["comps"], s["comps"] = pc, sc
    return p, s


def _node_params_from_record(node, rec):
    lp, ls = _layer_params_from_record(node, rec)
    p = {"layer": lp, "router": {}, "sinks": []}
    s = {"layer": ls, "router": {}, "sinks": []}
    if node.router is not None:
        p["router"], s["router"] = _layer_params_from_record(
            node.router, rec["router"])
    for snk, srec in zip(node.sinks, rec["sinks"]):
        sp, ss = _node_params_from_record(snk, srec)
        p["sinks"].append(sp)
        s["sinks"].append(ss)
    return p, s


def decode_net(record):
    """Rebuild (net, params, state, extra) from an encoded record.

    Mirrors reference scripts/lib/serdes.py:46-54: re-instantiate classes by
    name, rebuild the net (our build() replays shape inference the way the
    reference's link() replays graph construction), then load arrays."""
    net_cls = getattr(net_lib, record["type"])
    root = _decode_layer_obj(record["root"])
    net = net_cls(root=root, **{k: v for k, v in record["hypers"].items()})
    params, state = _node_params_from_record(net.root, record["root"])
    extra = record.get("extra")
    if extra is not None:
        extra = jax.tree.map(jnp.asarray, extra)
    return net, params, state, extra


def write_net(path, net, params, state, extra=None):
    atomic_save(path, encode_net(net, params, state, extra))


def read_net(path):
    return decode_net(np.load(path, allow_pickle=True)[()])
