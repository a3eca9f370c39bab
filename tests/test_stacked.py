"""Congruent-subtree stacking (ops.config.stacked_tails): the vmapped
template evaluation must match the serial unrolled trace.

dr_tree's 8 identical 5-deep tails (experiments.py:126-143) are the target:
the unrolled tree trace is 47 node applications; stacked it is ~12 node
templates, shrinking the HLO that the remote TPU compiler chews on for
10-20+ minutes, and batching the many small per-tail convs into wider MXU
ops. Numerically it is the same math executed under vmap, so forward values
match bitwise on CPU and gradients agree to fp32 reorder noise."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpnn_tpu.ops import config
from mpnn_tpu.models import ActorNet, CriticNet, SRNet, init_training
from mpnn_tpu.models.net import Ctx
from .test_train_e2e import pyr, rcm, reg


@pytest.fixture
def stacked_on():
    config.set_stacked_tails(True)
    yield
    config.set_stacked_tails(False)


def _sym_tree(net_cls, **kw):
    """A small symmetric tree: root fans into two IDENTICALLY-SHAPED
    branches (each rcm->reg), the shape class the stack plan groups."""
    branch = lambda: rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10)))
    return net_cls(x0_shape=(16, 16, 3), y_shape=(10,),
                   root=pyr(branch(), branch()), **kw)


def _batch(seed=0, b=8):
    k = jax.random.PRNGKey(seed)
    x0 = jax.random.normal(k, (b, 16, 16, 3), jnp.float32)
    y = jax.nn.one_hot(jax.random.randint(
        jax.random.fold_in(k, 1), (b,), 0, 10), 10)
    return x0, y


def test_plan_groups_registry_tree_tails():
    """The real dr_tree registry net: 8 congruent 5-deep tails (10 nodes
    each) + congruent stem-level reg leaves must be grouped."""
    from mpnn_tpu.experiments import dr_tree
    net = dr_tree(ActorNet, k_cpt=0.0)((32, 32, 3), (10,))
    plan = net._stack_plan
    assert plan, "registry tree must produce a stack plan"
    widths = sorted((len(g["members"]), len(g["preorders"][0]))
                    for g in plan)
    # The dominant group: 8 identical depth-3 tails of 10 nodes each.
    assert (8, 10) in widths
    # Disjointness: no tree node appears in two groups.
    seen = set()
    for g in plan:
        for pre in g["preorders"]:
            ids = {id(n) for n in pre}
            assert not (ids & seen)
            seen |= ids


def test_plan_on_chain_is_reg_leaves():
    """Chains have no congruent interior subtrees, but dr_chain's identical
    LogReg leaves off each trunk node group."""
    from mpnn_tpu.experiments import dr_chain
    net = dr_chain(ActorNet, k_cpt=0.0)((32, 32, 3), (10,))
    for g in net._stack_plan:
        assert len(g["preorders"][0]) == 1  # leaf-only groups


@pytest.mark.parametrize("net_cls,kw", [
    (SRNet, {}),
    (ActorNet, {"k_cpt": 1e-9}),
    (CriticNet, {"k_cpt": 1e-9}),
])
def test_forward_and_loss_parity(stacked_on, net_cls, kw):
    """Stacked vs serial: every Rec field and the scalar loss agree."""
    net = _sym_tree(net_cls, **kw)
    params, state, _ = init_training(net, seed=3)
    x0, y = _batch()
    ctx = Ctx(train=True, tau=0.8, eps=1e-6, k_cpt=1e-9)

    config.set_stacked_tails(False)
    recs_s, ns_s = net.forward(params, state, x0, y, ctx)
    loss_s = net.loss(recs_s, len(x0), ctx)
    config.set_stacked_tails(True)
    recs_v, ns_v = net.forward(params, state, x0, y, ctx)
    loss_v = net.loss(recs_v, len(x0), ctx)

    assert set(recs_s) == set(recs_v)
    for node in recs_s:
        for f in ("x", "c_err", "c_mod", "router_x", "p_tr", "p_ev"):
            a, b = getattr(recs_s[node], f), getattr(recs_v[node], f)
            if a is None:
                assert b is None, f
                continue
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            assert len(la) == len(lb), f
            for xa, xb in zip(la, lb):
                np.testing.assert_allclose(
                    np.asarray(xa, np.float32), np.asarray(xb, np.float32),
                    rtol=2e-6, atol=2e-7,
                    err_msg=f"node{node._uid}.{f}")
    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_v),
                               rtol=2e-6, atol=0)
    # New-state pytrees (BN EMA updates) agree leaf-by-leaf.
    flat_s = jax.tree_util.tree_leaves_with_path(ns_s)
    flat_v = dict(jax.tree_util.tree_leaves_with_path(ns_v))
    for path, leaf in flat_s:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_v[path]),
                                   rtol=2e-6, atol=2e-7,
                                   err_msg=str(path))


def test_grad_parity(stacked_on):
    """d(loss)/d(params) agrees between the stacked and serial traces to
    fp32 reorder noise (vmapped conv reductions reassociate)."""
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    params, state, _ = init_training(net, seed=5)
    x0, y = _batch(seed=7)
    ctx = Ctx(train=True, tau=1.0, eps=1e-6, k_cpt=1e-9)

    def loss_fn(p):
        recs, _ = net.forward(p, state, x0, y, ctx)
        return net.loss(recs, len(x0), ctx)

    config.set_stacked_tails(False)
    g_s = jax.grad(loss_fn)(params)
    config.set_stacked_tails(True)
    g_v = jax.grad(loss_fn)(params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=str(path))


def test_jitted_train_step_trajectory(stacked_on, synth_dataset):
    """A few jitted train steps track the serial trajectory closely (exact
    bitwise equality is NOT expected -- vmapped convs reassociate fp32)."""
    from mpnn_tpu.models import Schedules, make_train_step
    net = _sym_tree(ActorNet, k_cpt=1e-9)

    def run(flag):
        config.set_stacked_tails(flag)
        params, state, vel = init_training(net, seed=0)
        step = make_train_step(net, 16, Schedules(lr=lambda t: 0.02))
        x0_tr, y_tr, m_sym = synth_dataset.train_arrays
        rng = jax.random.PRNGKey(4)
        cs = []
        for t in range(3):
            params, state, vel, c = step(params, state, vel, t, rng,
                                         x0_tr, y_tr, m_sym)
            cs.append(float(c))
        return cs, params

    cs_s, p_s = run(False)
    cs_v, p_v = run(True)
    np.testing.assert_allclose(cs_s, cs_v, rtol=1e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_s),
            jax.tree_util.tree_leaves_with_path(p_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5, err_msg=str(path))


def test_dropout_streams_distinct_per_member(stacked_on):
    """With identical params in two congruent branches, train-mode dropout
    must draw DIFFERENT masks per member (the member-root uid is folded on
    top of the shared template stream) -- and be deterministic per rng."""
    from mpnn_tpu.ops import (Chain, LinTrans, Softmax, Dropout,
                              CrossEntropyError, Select, ToPyramid)
    leaf = lambda: Chain(name="DropReg", comps=[
        Select(i=-1), LinTrans(n_chan=10, k_l2=0.0), Dropout(λ=0.5),
        Softmax(), CrossEntropyError()])
    net = SRNet(x0_shape=(8, 8, 3), y_shape=(10,),
                root=Chain(name="Stem", comps=[ToPyramid(n_scales=1)],
                           sinks=(leaf(), leaf()),
                           router=None))
    params, state, _ = init_training(net, seed=0)
    # Copy branch 0's params into branch 1 so only the rng stream differs.
    params["sinks"][1] = jax.tree_util.tree_map(lambda a: a,
                                                params["sinks"][0])
    x0 = jnp.ones((4, 8, 8, 3))
    y = jnp.eye(10)[:4]
    rng = jax.random.PRNGKey(11)
    ctx = Ctx(train=True, rng=rng, tau=1.0)

    assert net._stack_plan and len(net._stack_plan[0]["members"]) == 2
    recs, _ = net.forward(params, state, x0, y, ctx)
    leaves = list(net.leaves)
    a = np.asarray(recs[leaves[0]].x)
    b = np.asarray(recs[leaves[1]].x)
    assert not np.allclose(a, b), "members must draw distinct dropout masks"
    # Deterministic for a fixed rng.
    recs2, _ = net.forward(params, state, x0, y, ctx)
    np.testing.assert_array_equal(a, np.asarray(recs2[leaves[0]].x))


def test_dyn_kcpt_tree_parity(stacked_on):
    """dyn_k_cpt appends the per-example cost feature to every router input
    (models/routed.py:_router_input); under the stacked vmap ctx.k_cpt is
    closed over, not batched -- loss and grads must still match serial."""
    net = _sym_tree(ActorNet, k_cpt=0.0, dyn_k_cpt=True)
    params, state, _ = init_training(net, seed=1)
    x0, y = _batch(seed=2)
    k_cpt = jnp.asarray(np.linspace(0.0, 6.4e-8, len(x0)), jnp.float32)
    ctx = Ctx(train=True, tau=0.9, eps=1e-6, k_cpt=k_cpt)

    def loss_fn(p):
        recs, _ = net.forward(p, state, x0, y, ctx)
        return net.loss(recs, len(x0), ctx)

    config.set_stacked_tails(False)
    l_s, g_s = jax.value_and_grad(loss_fn)(params)
    config.set_stacked_tails(True)
    l_v, g_v = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_v), rtol=2e-6)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_s),
            jax.tree_util.tree_leaves_with_path(g_v)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6, err_msg=str(path))


def test_stacked_sweep_mesh_fails_loud(stacked_on, synth_dataset):
    """stacked_tails × sweep mesh is unsupported (upstream JAX conv
    batching under double-vmap + sharding raises NotImplementedError deep
    in the trace) AND a measured on-chip regression under the sweep vmap;
    make_sweep_train_loop must reject the combination up front. The
    MESHLESS sweep × stacked composition works (measured, docs/perf.md)
    and stays allowed."""
    from mpnn_tpu.models import Schedules
    from mpnn_tpu.models.steps import make_sweep_train_loop
    from mpnn_tpu.parallel import make_sweep_mesh
    net = _sym_tree(ActorNet, k_cpt=0.0)
    config.set_stacked_tails(True)
    with pytest.raises(ValueError, match="stacked_tails"):
        make_sweep_train_loop(net, 16, Schedules(lr=lambda t: 0.05),
                              mesh=make_sweep_mesh(n_sweep=4, n_data=2))
    # Meshless stays allowed.
    make_sweep_train_loop(net, 16, Schedules(lr=lambda t: 0.05))

    # The flag is mutable config: constructing with it OFF then enabling
    # it before the first call must ALSO fail loud (trace-time re-check),
    # not die in JAX's conv batching rule.
    from mpnn_tpu.models.steps import stack_trees
    from mpnn_tpu.parallel import shard_sweep_tree
    config.set_stacked_tails(False)
    mesh = make_sweep_mesh(n_sweep=4, n_data=2)
    loop = make_sweep_train_loop(net, 16, Schedules(lr=lambda t: 0.05),
                                 sample_tile=3, mesh=mesh)
    members = [init_training(net, seed=i) for i in range(4)]
    p = shard_sweep_tree(stack_trees([m[0] for m in members]), mesh)
    s = shard_sweep_tree(stack_trees([m[1] for m in members]), mesh)
    v = shard_sweep_tree(stack_trees([m[2] for m in members]), mesh)
    config.set_stacked_tails(True)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    with pytest.raises(ValueError, match="stacked_tails"):
        loop(p, s, v, 0, jax.random.PRNGKey(5), x0_tr, y_tr, m_sym, 2,
             jnp.zeros((4,), jnp.float32))


def test_pack_unpack_roundtrip(stacked_on):
    """pack_tree/unpack_tree are exact inverses for params/state/vel, at
    member axis 0 and (sweep layout) axis 1."""
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    assert net._stack_plan
    trees = init_training(net, seed=9)
    for tree in trees:
        packed = net.pack_tree(tree)
        assert net.is_packed(packed) and not net.is_packed(tree)
        back = net.unpack_tree(packed)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(tree),
                jax.tree_util.tree_leaves_with_path(back)):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # axis=1: leaves already carry a leading sweep axis.
    sweep = jax.tree_util.tree_map(
        lambda a: jnp.stack([a, a + 1.0]), trees[0])
    back = net.unpack_tree(net.pack_tree(sweep, axis=1), axis=1)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(sweep),
            jax.tree_util.tree_leaves_with_path(back)):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_forward_matches_dynamic_stacking(stacked_on):
    """forward() on pack_tree's layout is the SAME vmapped math as the
    per-call-stacking path: recs bitwise, new state equal after unpack."""
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    params, state, _ = init_training(net, seed=3)
    x0, y = _batch()
    ctx = Ctx(train=True, tau=0.8, eps=1e-6, k_cpt=1e-9)

    recs_v, ns_v = net.forward(params, state, x0, y, ctx)
    recs_p, ns_p = net.forward(net.pack_tree(params), net.pack_tree(state),
                               x0, y, ctx)
    assert net.is_packed(ns_p)
    for node in recs_v:
        for f in ("x", "c_err", "c_mod", "router_x"):
            a, b = getattr(recs_v[node], f), getattr(recs_p[node], f)
            if a is None:
                assert b is None
                continue
            la = jax.tree_util.tree_leaves(a)
            lb = jax.tree_util.tree_leaves(b)
            assert len(la) == len(lb), f
            for xa, xb in zip(la, lb):
                np.testing.assert_array_equal(
                    np.asarray(xa, np.float32), np.asarray(xb, np.float32),
                    err_msg=f"node{node._uid}.{f}")
    flat_v = jax.tree_util.tree_leaves_with_path(ns_v)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(
        net.unpack_tree(ns_p)))
    for path, leaf in flat_v:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_p[path]),
                                      err_msg=str(path))


@pytest.mark.parametrize("analytic_l2", [False, True])
def test_packed_train_loop_matches_serial(stacked_on, synth_dataset,
                                          analytic_l2):
    """The scan-chained loop under stacked_tails (which now carries the
    grouped tails PRE-STACKED, exercising the packed TALR / analytic-L2 /
    momentum walks) tracks the serial loop's trajectory."""
    from mpnn_tpu.models import Schedules
    from mpnn_tpu.models.steps import make_train_loop
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays

    def run(flag):
        config.set_stacked_tails(flag)
        config.set_analytic_l2(analytic_l2)
        try:
            params, state, vel = init_training(net, seed=0)
            loop = make_train_loop(net, 16, Schedules(lr=lambda t: 0.02),
                                   sample_tile=3)
            params, state, vel, cs = loop(
                params, state, vel, 0, jax.random.PRNGKey(4),
                x0_tr, y_tr, m_sym, 5)
        finally:
            config.set_analytic_l2(False)
        assert not net.is_packed(params)  # host-facing layout restored
        return np.asarray(cs), params

    cs_s, p_s = run(False)
    cs_p, p_p = run(True)
    np.testing.assert_allclose(cs_s, cs_p, rtol=1e-4)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_s),
            jax.tree_util.tree_leaves_with_path(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5, err_msg=str(path))


def test_packed_sweep_loop_matches_unstacked(stacked_on, synth_dataset):
    """The meshless vmapped k_cpt sweep with stacked_tails (grouped tails
    carried pre-stacked at member axis 1, after the sweep axis) tracks the
    plain sweep loop."""
    from mpnn_tpu.models import Schedules
    from mpnn_tpu.models.steps import make_sweep_train_loop, stack_trees
    net = _sym_tree(ActorNet, k_cpt=0.0)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays
    k = jnp.asarray([0.0, 1e-9, 4e-9], jnp.float32)

    def run(flag):
        config.set_stacked_tails(flag)
        members = [init_training(net, seed=i) for i in range(3)]
        p = stack_trees([m[0] for m in members])
        s = stack_trees([m[1] for m in members])
        v = stack_trees([m[2] for m in members])
        loop = make_sweep_train_loop(net, 16,
                                     Schedules(lr=lambda t: 0.02),
                                     sample_tile=3)
        p, s, v, cs = loop(p, s, v, 0, jax.random.PRNGKey(6),
                           x0_tr, y_tr, m_sym, 5, k)
        assert not net.is_packed(p)
        return np.asarray(cs), p

    cs_s, p_s = run(False)
    cs_p, p_p = run(True)
    np.testing.assert_allclose(cs_s, cs_p, rtol=1e-4, atol=1e-6)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_s),
            jax.tree_util.tree_leaves_with_path(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5, err_msg=str(path))


def test_stacked_eval_split_matches_serial(stacked_on, synth_dataset):
    """The scan evaluator under stacking equals the serial evaluator."""
    from mpnn_tpu.models import make_eval_split_fn
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    params, state, _ = init_training(net, seed=2)
    x0s, ys, mask, n = synth_dataset.padded_split("ts", 32)

    config.set_stacked_tails(False)
    sums_s = make_eval_split_fn(net, 32)(params, state, x0s, ys, mask,
                                         1.0, 1e-9)
    config.set_stacked_tails(True)
    sums_v = make_eval_split_fn(net, 32)(params, state, x0s, ys, mask,
                                         1.0, 1e-9)
    assert set(sums_s) == set(sums_v)
    for k in sums_s:
        np.testing.assert_allclose(np.asarray(sums_s[k]),
                                   np.asarray(sums_v[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


# ------------------------------------------------- randomized-topology fuzz

def _random_tree(rng, depth=0):
    """Random tree with duplication bias so congruent subtrees appear at
    random depths: at each expansion, with p=0.5 reuse an earlier subtree
    SPEC (not object) from this tree, creating a congruence class. Exercises
    _compute_stack_plan's greedy disjoint grouping on asymmetric shapes
    (nested congruence, incongruent siblings, groups at different depths)."""
    specs = []  # [(spec, n_scales it consumes)]

    def gen(depth, scales):
        # An MCM's n_chan list can't exceed the scales flowing into it
        # (registry invariant: scale counts shrink down the tree).
        if depth >= 3 or scales < 1 or rng.random() < 0.25 * depth:
            return ("reg",)
        reusable = [s for s, sc in specs if sc <= scales]
        if reusable and rng.random() < 0.5:
            return reusable[int(rng.integers(len(reusable)))]
        n_sc = int(rng.integers(1, scales + 1))
        widths = [int(rng.choice([4, 8])) for _ in range(n_sc)]
        spec = ("rcm", tuple(widths),
                tuple(gen(depth + 1, n_sc)
                      for _ in range(int(rng.integers(1, 3)))))
        specs.append((spec, n_sc))
        return spec

    def build(spec):
        if spec[0] == "reg":
            return reg(10)
        return rcm(list(spec[1]), *[build(s) for s in spec[2]])

    return pyr(*[build(gen(1, 3)) for _ in range(int(rng.integers(1, 3)))])


@pytest.mark.parametrize("seed", [0, 2, 5, 6])  # 0: 4-wide leaf group;
# 2: asymmetric; 5/6: multi-node (2- and 3-deep) subtree groups.
def test_fuzz_random_topology_parity(stacked_on, seed):
    """Random asymmetric trees: plan disjointness + loss/state parity of
    serial vs stacked vs packed forward."""
    rng = np.random.default_rng(seed)
    net = ActorNet(x0_shape=(16, 16, 3), y_shape=(10,),
                   root=_random_tree(rng), k_cpt=1e-9)
    # Plan invariant: groups are >=2-wide and node-disjoint.
    seen = set()
    for g in net._stack_plan:
        assert len(g["members"]) >= 2
        for pre in g["preorders"]:
            ids = {id(n) for n in pre}
            assert not (ids & seen)
            seen |= ids

    params, state, _ = init_training(net, seed=seed)
    x0, y = _batch(seed=seed, b=4)
    ctx = Ctx(train=True, tau=0.8, eps=1e-6, k_cpt=1e-9)

    config.set_stacked_tails(False)
    recs_s, ns_s = net.forward(params, state, x0, y, ctx)
    loss_s = net.loss(recs_s, len(x0), ctx)
    config.set_stacked_tails(True)
    recs_v, _ = net.forward(params, state, x0, y, ctx)
    loss_v = net.loss(recs_v, len(x0), ctx)
    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_v),
                               rtol=2e-6, atol=0)
    if not net._stack_plan:
        return
    # Packed layout: same math, state returned packed and unpacks equal.
    recs_p, ns_p = net.forward(net.pack_tree(params), net.pack_tree(state),
                               x0, y, ctx)
    loss_p = net.loss(recs_p, len(x0), ctx)
    np.testing.assert_allclose(np.asarray(loss_v), np.asarray(loss_p),
                               rtol=0, atol=0)
    flat_s = jax.tree_util.tree_leaves_with_path(ns_s)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(
        net.unpack_tree(ns_p)))
    for path, leaf in flat_s:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_p[path]),
                                   rtol=2e-6, atol=2e-7, err_msg=str(path))


def test_stacked_mesh_train_loop_matches_serial(stacked_on, synth_dataset):
    """stacked_tails composes with the PLAIN loop's dp mesh through the
    per-step stacking fallback: the packed carry is meshless-only (its
    group stacks' scan-carry shardings would be GSPMD-inferred, not
    pinned -- see make_train_loop), so under a mesh the carry stays in
    node layout and the trajectory must still match the serial one."""
    from mpnn_tpu.models import Schedules
    from mpnn_tpu.models.steps import make_train_loop
    from mpnn_tpu.parallel import make_mesh
    net = _sym_tree(ActorNet, k_cpt=1e-9)
    x0_tr, y_tr, m_sym = synth_dataset.train_arrays

    def run(flag, mesh):
        config.set_stacked_tails(flag)
        params, state, vel = init_training(net, seed=0)
        loop = make_train_loop(net, 16, Schedules(lr=lambda t: 0.02),
                               mesh=mesh, sample_tile=3)
        params, state, vel, cs = loop(
            params, state, vel, 0, jax.random.PRNGKey(4),
            x0_tr, y_tr, m_sym, 4)
        assert not net.is_packed(params)
        return np.asarray(cs)

    cs_serial = run(False, None)
    cs_mesh = run(True, make_mesh(n_data=2, n_model=1))
    np.testing.assert_allclose(cs_serial, cs_mesh, rtol=1e-4)
