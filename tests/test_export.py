"""Serving-artifact export (mpnn_tpu/export.py): StableHLO round-trip,
parity with the direct routed-inference path, adaptive price operand,
multi-platform lowering."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.models import ActorNet, init_training
from mpnn_tpu.models.infer import make_routed_infer_fn
from mpnn_tpu import export as ex
from .test_train_e2e import pyr, rcm, reg


@pytest.fixture(scope="module")
def small_net(synth_dataset):
    root = pyr(rcm([8, 8], reg(10),
                   rcm([8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root, k_cpt=1e-9)
    params, state, _ = init_training(net, seed=7)
    return net, params, state


def _x0(synth_dataset, b):
    return jnp.asarray(synth_dataset.x0_ts[:b])


def test_roundtrip_matches_direct(small_net, synth_dataset, tmp_path):
    """Export → bytes on disk → deserialize → call agrees with the live
    make_routed_infer_fn on every output (params are baked-in constants)."""
    net, params, state = small_net
    B = 16
    exported = ex.export_infer(net, params, state, batch_size=B)
    path = tmp_path / "net.shlo"
    ex.save_artifact(exported, path)
    fn = ex.serve_fn(path)

    x0 = _x0(synth_dataset, B)
    got = fn(x0)
    want = make_routed_infer_fn(net, B)(params, state, x0)
    for k in ("probs", "exit_idx", "ops"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_artifact_is_self_contained(small_net, synth_dataset, tmp_path):
    """The artifact runs through jax.export alone — no mpnn_tpu objects.
    (Deserialize bytes directly, call .call; exits land on real leaves.)"""
    from jax import export as jax_export
    net, params, state = small_net
    B = 8
    ex.save_artifact(
        ex.export_infer(net, params, state, batch_size=B),
        tmp_path / "net.shlo")
    with open(tmp_path / "net.shlo", "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    out = exported.call(_x0(synth_dataset, B))
    exit_idx = np.asarray(out["exit_idx"])
    n_leaves = sum(1 for l in net.layers if len(l.sinks) == 0)
    assert ((exit_idx >= 0) & (exit_idx < n_leaves)).all()
    assert np.asarray(out["probs"]).shape == (B, 10)


def test_dyn_k_cpt_operand(synth_dataset, tmp_path):
    """Adaptive export keeps k_cpt as a runtime scalar: one artifact, two
    prices, and the aggressive price exits strictly earlier on average."""
    root = pyr(rcm([8, 8], reg(10),
                   rcm([8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root,
                   k_cpt=1e-9, dyn_k_cpt=True)
    params, state, _ = init_training(net, seed=11)
    B = 16
    ex.save_artifact(
        ex.export_infer(net, params, state, batch_size=B, dyn_k_cpt=True),
        tmp_path / "ada.shlo")
    fn = ex.serve_fn(tmp_path / "ada.shlo")
    x0 = _x0(synth_dataset, B)
    cheap = fn(x0, jnp.float32(1e-12))
    dear = fn(x0, jnp.float32(1e-2))
    want = make_routed_infer_fn(net, B)(params, state, x0,
                                        jnp.float32(1e-2))
    np.testing.assert_allclose(np.asarray(dear["ops"]),
                               np.asarray(want["ops"]))
    assert np.asarray(cheap["ops"]).shape == (B,)


def test_capacity_baked(small_net, synth_dataset, tmp_path):
    """capacities < 1 exports the force-exit plan; outputs match the live
    engine at the same capacity."""
    net, params, state = small_net
    B = 16
    ex.save_artifact(
        ex.export_infer(net, params, state, batch_size=B, capacities=0.5),
        tmp_path / "cap.shlo")
    fn = ex.serve_fn(tmp_path / "cap.shlo")
    x0 = _x0(synth_dataset, B)
    got = fn(x0)
    want = make_routed_infer_fn(net, B, capacities=0.5)(params, state, x0)
    for k in ("probs", "exit_idx", "ops"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   err_msg=k)


def test_multi_platform_lowering(small_net):
    """One artifact lowered for both tpu and cpu serializes and reports
    both targets (lowering is platform-independent; no TPU needed)."""
    net, params, state = small_net
    exported = ex.export_infer(net, params, state, batch_size=8,
                               platforms=("tpu", "cpu"))
    assert set(exported.platforms) == {"tpu", "cpu"}
    data = exported.serialize()
    assert len(bytes(data)) > 1000
