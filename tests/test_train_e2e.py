"""End-to-end training smoke tests: SR / actor / critic nets on synthetic
data -- loss decreases, stats are sane, TALR scaling applies
(the reference's de-facto verification is watching these quantities,
SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import (Chain, LinTrans, Rect, Softmax, CrossEntropyError,
                          BatchNorm, ToPyramid, MultiscaleConvMax,
                          MultiscaleBatchNorm, MultiscaleRect, Select)
from mpnn_tpu.models import (SRNet, ActorNet, CriticNet, Schedules,
                             make_train_step, make_eval_split_fn,
                             init_training)


def router(n_sinks, n_chan=8):
    if n_sinks < 2:
        return None
    return Chain(name="Router", comps=[
        Select(i=-1), LinTrans(n_chan=n_chan, k_l2=1e-4), BatchNorm(),
        Rect(), LinTrans(n_chan=n_sinks, k_l2=1e-4, σ_w=0)])


def reg(n_cls):
    return Chain(name="LogReg", comps=[
        Select(i=-1), LinTrans(n_chan=n_cls, k_l2=1e-4), Softmax(),
        CrossEntropyError()])


def rcm(n_chan, *sinks):
    return Chain(name="ReConvMax", sinks=sinks, router=router(len(sinks)),
                 comps=[MultiscaleConvMax(n_chan=n_chan, supp=3, k_l2=1e-4),
                        MultiscaleBatchNorm(), MultiscaleRect()])


def pyr(*sinks):
    return Chain(name="ToPyramid", sinks=sinks, router=router(len(sinks)),
                 comps=[ToPyramid(n_scales=3)])


def _train(net, ds, n_steps=60, batch=32, tau_fn=None):
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=tau_fn)
    step = make_train_step(net, batch, sched)
    x0_tr, y_tr, m_sym = ds.train_arrays
    rng = jax.random.PRNGKey(9)
    losses = []
    for t in range(n_steps):
        params, state, vel, c = step(params, state, vel, t, rng,
                                     x0_tr, y_tr, m_sym)
        losses.append(float(c))
    return params, state, losses


def test_sr_loss_decreases(synth_dataset):
    net = SRNet(x0_shape=synth_dataset.x0_shape,
                y_shape=synth_dataset.y_shape,
                root=pyr(rcm([8, 8, 8], reg(10))))
    params, state, losses = _train(net, synth_dataset)
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_actor_trains_and_stats_consistent(synth_dataset):
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root, k_cpt=1e-9)
    params, state, losses = _train(net, synth_dataset,
                                   tau_fn=lambda t: 1.0)
    assert np.mean(losses[-10:]) < np.mean(losses[:10])

    ev = make_eval_split_fn(net, 32)
    x0s, ys, mask, n = synth_dataset.padded_split("ts", 32)
    sums = ev(params, state, x0s, ys, mask, 1.0, 1e-9)
    means = {k: np.asarray(v) / n for k, v in sums.items()}
    # acc = sum of per-leaf p_cor; moc positive and bounded by total ops.
    leaves = [l for l in net.leaves]
    acc_from_leaves = sum(means[f"{l._uid}/p_cor"] for l in leaves)
    np.testing.assert_allclose(means["net/acc"], acc_from_leaves, rtol=1e-5)
    total_ops = sum(l.n_ops + (l.router.n_ops if l.router else 0)
                    for l in net.layers)
    assert 0 < means["net/moc"] <= total_ops + 1e-6
    # p_cor + p_inc over leaves partitions the eval mass.
    mass = sum(means[f"{l._uid}/p_cor"] + means[f"{l._uid}/p_inc"]
               for l in leaves)
    np.testing.assert_allclose(mass, 1.0, rtol=1e-5)
    # by-class stats sum to the scalar stats.
    for l in leaves:
        np.testing.assert_allclose(
            np.sum(means[f"{l._uid}/p_cor_by_cls"]),
            means[f"{l._uid}/p_cor"], rtol=1e-4, atol=1e-7)


def test_critic_trains(synth_dataset):
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    net = CriticNet(x0_shape=synth_dataset.x0_shape,
                    y_shape=synth_dataset.y_shape, root=root, k_cpt=1e-9)
    params, state, losses = _train(net, synth_dataset,
                                   tau_fn=lambda t: 0.1)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_adaptive_dyn_k_cpt_trains(synth_dataset):
    """dyn_k_cpt: per-example compute price as router input
    (reference scripts/lib/net_types.py:146-164)."""
    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root,
                   dyn_k_cpt=True)
    params, state, vel = init_training(net, seed=0)
    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0,
                      k_cpt_sample=[0.0, 1e-9, 2e-9, 4e-9])
    step = make_train_step(net, 32, sched)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    rng = jax.random.PRNGKey(3)
    losses = []
    for t in range(40):
        params, state, vel, c = step(params, state, vel, t, rng,
                                     x0_tr, y_tr, m_sym)
        losses.append(float(c))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # Eval at a fixed k_cpt, as train-adaptive-nets does post hoc (:101-105).
    ev = make_eval_split_fn(net, 32)
    x0s, ys, mask, n = synth_dataset.padded_split("ts", 32)
    sums = ev(params, state, x0s, ys, mask, 1.0, 4e-9)
    assert np.isfinite(np.asarray(sums["net/acc"]))


def test_talr_scales_router_grads():
    """Router grads get alpha_rtr x the owning node's TALR factor
    (reference scripts/lib/net_types.py:24-37)."""
    from mpnn_tpu.models.optim import talr_scale_grads
    from mpnn_tpu.ops import NoOp

    leafA = Chain(name="A", comps=[LinTrans(n_chan=2)])
    leafB = Chain(name="B", comps=[LinTrans(n_chan=2)])
    rtr = Chain(name="Router", comps=[LinTrans(n_chan=2)])
    root = Chain(name="Root", comps=[LinTrans(n_chan=4)], router=rtr,
                 sinks=[leafA, leafB])
    net = ActorNet(x0_shape=(4,), y_shape=(2,), root=root, α_rtr=0.25)

    params, _ = net.init(jax.random.PRNGKey(0))
    grads = jax.tree.map(jnp.ones_like, params)
    p_tr = {str(net.root._uid): jnp.full((8,), 1.0),
            str(leafA._uid): jnp.full((8,), 0.25),
            str(leafB._uid): jnp.full((8,), 0.5)}
    scaled = talr_scale_grads(net, grads, p_tr, alpha_rtr=0.25, talr=True)
    # Root: p_tr=1 -> scale 1; router: 0.25 * 1.
    np.testing.assert_allclose(
        np.asarray(scaled["layer"]["comps"][0]["w"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(scaled["router"]["comps"][0]["w"]), 0.25)
    # Leaf A: 1/sqrt(mean(0.25^2)) = 4.
    np.testing.assert_allclose(
        np.asarray(scaled["sinks"][0]["layer"]["comps"][0]["w"]), 4.0,
        rtol=1e-6)
    # talr=False: layer scale 1, router alpha_rtr.
    scaled2 = talr_scale_grads(net, grads, p_tr, alpha_rtr=0.25, talr=False)
    np.testing.assert_allclose(
        np.asarray(scaled2["sinks"][0]["layer"]["comps"][0]["w"]), 1.0)


def test_train_loop_tiled_sampling(synth_dataset):
    """make_train_loop pre-gathers batches in sample_tile-sized spans; the
    tiling (full tiles + remainder) must cover exactly n_steps and train."""
    from mpnn_tpu.models.steps import make_train_loop

    net = SRNet(x0_shape=synth_dataset.x0_shape,
                y_shape=synth_dataset.y_shape,
                root=pyr(rcm([8, 8], reg(10))))
    sched = Schedules(lr=lambda t: 0.02)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    rng = jax.random.PRNGKey(9)

    # n_steps=10 with tile=4 -> 2 full tiles + remainder 2.
    loop = make_train_loop(net, 32, sched, sample_tile=4)
    params, state, vel = init_training(net, seed=0)
    params, state, vel, cs = loop(params, state, vel, 0, rng,
                                  x0_tr, y_tr, m_sym, 10)
    assert cs.shape == (10,)
    assert np.isfinite(np.asarray(cs)).all()

    # Chained calls continue training: 40 more steps lower the loss.
    for t0 in (10, 50):
        params, state, vel, cs2 = loop(params, state, vel, t0, rng,
                                       x0_tr, y_tr, m_sym, 40)
    assert np.mean(np.asarray(cs2)[-10:]) < np.mean(np.asarray(cs)[:5])

    # Determinism: same seed + fresh init reproduces the loss trace.
    params_b, state_b, vel_b = init_training(net, seed=0)
    _, _, _, cs_b = loop(params_b, state_b, vel_b, 0, rng,
                         x0_tr, y_tr, m_sym, 10)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cs_b), rtol=1e-6)


def test_vmapped_sweep_trains(synth_dataset):
    """make_sweep_train_loop: 3 same-arch actor nets training jointly, one
    vmapped program; losses decrease per member and members diverge (their
    k_cpt and inits differ)."""
    from mpnn_tpu.models.steps import (make_sweep_train_loop, stack_trees,
                                       unstack_tree)

    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root)
    k_cpts = jnp.asarray([0.0, 1e-9, 6.4e-8], jnp.float32)
    members = [init_training(net, seed=i) for i in range(3)]
    params_s = stack_trees([m[0] for m in members])
    state_s = stack_trees([m[1] for m in members])
    vel_s = stack_trees([m[2] for m in members])

    sched = Schedules(lr=lambda t: 0.02, tau=lambda t: 1.0)
    loop = make_sweep_train_loop(net, 32, sched, sample_tile=16)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    params_s, state_s, vel_s, cs = loop(params_s, state_s, vel_s, 0,
                                        jax.random.PRNGKey(7), x0_tr,
                                        y_tr, m_sym, 50, k_cpts)
    cs = np.asarray(cs)
    assert cs.shape == (50, 3)
    assert np.isfinite(cs).all()
    for i in range(3):
        assert np.mean(cs[-10:, i]) < np.mean(cs[:10, i])
    # Members are genuinely different runs.
    p0 = jax.tree.leaves(unstack_tree(params_s, 0))[0]
    p2 = jax.tree.leaves(unstack_tree(params_s, 2))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
