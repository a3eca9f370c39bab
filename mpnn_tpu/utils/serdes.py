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

import hashlib
import json
import os
import pickle
import zlib

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import layers as layer_lib
from .. import models as net_lib

__all__ = ["encode_net", "decode_net", "write_net", "read_net",
           "atomic_save", "write_compact", "read_compact"]


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


################################################################################
# Compact sharded archives (durable wide-net finals)
################################################################################
#
# The committed results/ archive caps files at 8 MB, which the fat
# (~22 MB) and fatter (~46-90 MB) width-ladder finals exceed — so they
# died with every microVM and a fresh clone could not re-eval them
# without a ~70 min retrain (VERDICT r4 missing #3; the reference keeps
# every write_net output, scripts/train-nets:157). A compact archive
# casts float arrays to bfloat16 (training computes in bf16 end-to-end
# already, so the cast is within the precision story the nets were
# trained under), zlib-compresses the pickled record, and splits it
# into parts each under the archive's per-file cap. read_compact
# reassembles, verifies sha256, and casts floats back to float32 so the
# rest of the stack (eval, figures, --resume) sees an ordinary record.

_COMPACT_MANIFEST = "MANIFEST.json"


def _cast_record_floats(obj, dtype):
    """Recursively cast float ndarrays in an encoded record."""
    if isinstance(obj, dict):
        return {k: _cast_record_floats(v, dtype) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        t = [_cast_record_floats(v, dtype) for v in obj]
        return t if isinstance(obj, list) else tuple(t)
    if isinstance(obj, np.ndarray) and jnp.issubdtype(obj.dtype,
                                                      jnp.floating):
        # NOTE neither dtype.kind ('V') nor np.issubdtype covers
        # ml_dtypes.bfloat16; only jnp's extended lattice does.
        return obj.astype(dtype)
    return obj


def write_compact(dirpath, record, *, part_bytes=7 << 20, src_sha=None):
    """Write an encoded net record as a sharded compact archive directory:
    zlib(pickle(bf16-cast record)) split into part-NN files of at most
    `part_bytes` each, plus a MANIFEST.json with content hashes. `src_sha`
    (hex) records the hash of the source checkpoint file so re-archiving
    an unchanged source can be skipped."""
    import ml_dtypes
    rec = _cast_record_floats(record, ml_dtypes.bfloat16)
    blob = zlib.compress(pickle.dumps(rec, protocol=4), level=6)
    os.makedirs(dirpath, exist_ok=True)
    parts = []
    for i in range(0, max(1, -(-len(blob) // part_bytes))):
        chunk = blob[i * part_bytes:(i + 1) * part_bytes]
        name = f"part-{i:02d}"
        tmp = os.path.join(dirpath, name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(chunk)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(dirpath, name))
        parts.append({"name": name, "bytes": len(chunk)})
    manifest = {"format": "mpnn-compact-v1", "codec": "zlib+pickle",
                "float_dtype": "bfloat16", "parts": parts,
                "sha256": hashlib.sha256(blob).hexdigest(),
                "src_sha256": src_sha}
    # Stale parts from a previous (larger) archive of the same path would
    # corrupt reassembly.
    for name in os.listdir(dirpath):
        if name.startswith("part-") and not name.endswith(".tmp") \
                and name not in {p["name"] for p in parts}:
            os.remove(os.path.join(dirpath, name))
    tmp = os.path.join(dirpath, _COMPACT_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(dirpath, _COMPACT_MANIFEST))
    return manifest


def compact_src_sha(dirpath):
    """The recorded source-file sha of an existing compact archive, or
    None (lets the archiver skip unchanged sources without re-encoding)."""
    try:
        with open(os.path.join(dirpath, _COMPACT_MANIFEST)) as f:
            return json.load(f).get("src_sha256")
    except (OSError, ValueError):
        return None


def read_compact(dirpath, *, restore_dtype=np.float32):
    """Reassemble a compact archive into an ordinary encoded record
    (floats cast to `restore_dtype`); decode with serdes.decode_net."""
    with open(os.path.join(dirpath, _COMPACT_MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["format"] == "mpnn-compact-v1", manifest["format"]
    blob = b"".join(
        open(os.path.join(dirpath, p["name"]), "rb").read()
        for p in manifest["parts"])
    got = hashlib.sha256(blob).hexdigest()
    if got != manifest["sha256"]:
        raise IOError(f"compact archive {dirpath} corrupt: sha {got} != "
                      f"manifest {manifest['sha256']}")
    rec = pickle.loads(zlib.decompress(blob))
    return _cast_record_floats(rec, restore_dtype)
