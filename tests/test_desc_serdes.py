"""Descriptor schema + rendering + checkpoint round-trips.

The descriptor dict is the stable on-disk contract all five reference figure
scripts consume (scripts/lib/desc.py:24-36; SURVEY.md section 2 #19); these
tests walk it exactly the way the consumers do (e.g. make-routing-hists
walks sinks[0]/sinks[1] positionally, scripts/make-routing-hists:19-27)."""

import os

import numpy as np
import jax
import pytest

from mpnn_tpu.models import ActorNet, SRNet, Schedules, make_train_step, \
    init_training
from mpnn_tpu.utils.desc import net_desc, render_net_desc
from mpnn_tpu.utils.serdes import encode_net, decode_net, write_net, read_net
from .test_train_e2e import pyr, rcm, reg


def _make_ac_chain(ds, k_cpt=1e-9):
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    return ActorNet(x0_shape=ds.x0_shape, y_shape=ds.y_shape, root=root,
                    k_cpt=k_cpt)


def test_desc_schema(synth_dataset):
    net = _make_ac_chain(synth_dataset)
    params, state, _ = init_training(net, 0)
    desc = net_desc(net, synth_dataset, params, state, batch_size=32,
                    tau=1.0)
    # Net-level schema (reference scripts/lib/desc.py:31-36).
    assert desc["type"] == "ActorNet"
    assert set(desc) == {"type", "stats_tr", "stats_ts", "root"}
    assert {"acc", "moc"} <= set(desc["stats_ts"])
    assert np.ndim(desc["stats_ts"]["acc"]) == 0
    # Layer-level schema (reference scripts/lib/desc.py:24-29).
    root = desc["root"]
    assert set(root) == {"name", "stats_tr", "stats_ts", "sinks"}
    assert root["name"] == "ToPyramid"
    # Walk the chain like make-routing-hists: sinks[0]=leaf, sinks[1]=next.
    node = root["sinks"][0]  # first ReConvMax
    assert node["name"] == "ReConvMax"
    leaf = node["sinks"][0]
    assert leaf["name"] == "LogReg"
    for key in ("p_cor", "p_inc", "p_tr", "c_err"):
        assert key in leaf["stats_ts"], key
        assert np.ndim(leaf["stats_ts"][key]) == 0
    # Per-class stats are lists (reference desc.py:22 tolist()).
    assert isinstance(leaf["stats_ts"]["p_cor_by_cls"], list)
    assert len(leaf["stats_ts"]["p_cor_by_cls"]) == 10
    # Switch nodes carry x_rte.
    assert "x_rte" in node["stats_ts"]
    # acc equals the leaf p_cor sum (train-nets:119).
    leaves_pcor = []

    def walk(d):
        if not d["sinks"]:
            leaves_pcor.append(d["stats_ts"].get("p_cor", 0.0))
        for s in d["sinks"]:
            walk(s)

    walk(root)
    np.testing.assert_allclose(desc["stats_ts"]["acc"], sum(leaves_pcor),
                               rtol=1e-5)


def test_desc_npy_roundtrip(tmp_path, synth_dataset):
    """Descriptors survive np.save/np.load the way figure scripts read them
    (scripts/make-acc-eff-plots:23-24)."""
    net = _make_ac_chain(synth_dataset)
    params, state, _ = init_training(net, 0)
    desc = net_desc(net, synth_dataset, params, state, batch_size=32,
                    tau=1.0)
    p = tmp_path / "0000-stats.npy"
    np.save(p, desc)
    loaded = np.load(p, allow_pickle=True)[()]
    assert loaded["stats_ts"]["acc"] == desc["stats_ts"]["acc"]
    assert loaded["root"]["sinks"][0]["name"] == "ReConvMax"


def test_render_format(synth_dataset):
    """Rendered tree uses the reference's box-drawing format
    (scripts/lib/desc.py:57-79)."""
    net = _make_ac_chain(synth_dataset)
    params, state, _ = init_training(net, 0)
    desc = net_desc(net, synth_dataset, params, state, batch_size=32,
                    tau=1.0)
    text = render_net_desc(desc, "test-net")
    assert text.startswith("┌")
    assert "│ test-net" in text
    assert "[ActorNet]" in text
    assert "↳ " in text
    assert "acc=" in text and "moc=" in text


def test_serdes_roundtrip(tmp_path, synth_dataset):
    """encode -> write -> read -> decode reproduces architecture, params,
    state, and forward outputs exactly
    (reference scripts/lib/serdes.py:40-60)."""
    net = _make_ac_chain(synth_dataset, k_cpt=2e-9)
    params, state, vel = init_training(net, 0)
    # Train a couple steps so BN state is nontrivial.
    sched = Schedules(lr=lambda t: 0.01, tau=lambda t: 1.0)
    step = make_train_step(net, 16, sched)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    rng = jax.random.PRNGKey(0)
    for t in range(3):
        params, state, vel, _ = step(params, state, vel, t, rng,
                                     x0_tr, y_tr, m_sym)

    path = tmp_path / "net.npy"
    write_net(str(path), net, params, state, extra={"vel": vel, "t": 3})
    net2, params2, state2, extra = read_net(str(path))

    assert type(net2).__name__ == "ActorNet"
    assert net2.hypers.k_cpt == 2e-9
    assert extra["t"] == 3
    # Same tree shape and op counts.
    assert [l.n_ops for l in net2.layers] == [l.n_ops for l in net.layers]
    # Params bit-identical.
    flat1 = jax.tree.leaves(params)
    flat2 = jax.tree.leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Forward outputs identical on the same batch.
    from mpnn_tpu.models.net import Ctx
    xb = x0_tr[:8]
    yb = y_tr[:8]
    ctx = Ctx(train=False, tau=1.0, eps=1e-6, k_cpt=2e-9)
    recs1, _ = net.forward(params, state, xb, yb, ctx)
    recs2, _ = net2.forward(params2, state2, xb, yb, ctx)
    for l1, l2 in zip(net.layers, net2.layers):
        np.testing.assert_allclose(np.asarray(recs1[l1].c_err),
                                   np.asarray(recs2[l2].c_err), atol=1e-6)


def test_checkpoint_schema_matches_reference(tmp_path, synth_dataset):
    """The saved record has the reference's self-describing nested schema
    (scripts/lib/serdes.py:13-19): type/name/hypers/params/sinks/comps/router
    per layer; BatchNorm EMA stats live under params."""
    net = _make_ac_chain(synth_dataset)
    params, state, _ = init_training(net, 0)
    rec = encode_net(net, params, state)
    assert set(rec) >= {"type", "root", "hypers", "params"}
    root = rec["root"]
    assert set(root) == {"type", "name", "hypers", "params", "sinks",
                         "comps", "router"}
    assert root["type"] == "Chain" and root["name"] == "ToPyramid"
    # pyr has a single sink, so no router (reference router(1) -> None,
    # scripts/arch_and_hypers.py:45-46); the first ReConvMax is a switch.
    assert root["router"] is None
    switch = root["sinks"][0]
    assert switch["router"] is not None
    # Router BatchNorm record carries gamma/beta/m_avg/v_avg in params.
    bn = switch["router"]["comps"][2]
    assert bn["type"] == "BatchNorm"
    assert {"γ", "β", "m_avg", "v_avg"} <= set(bn["params"])
    # MCM params use the reference naming.
    mcm = root["sinks"][0]["comps"][0]
    assert mcm["type"] == "MultiscaleConvMax"
    assert {"w_horz_0", "w_vert_0", "b_0"} <= set(mcm["params"])
