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
