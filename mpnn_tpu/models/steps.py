"""Jitted train / eval step builders.

The whole reference hot loop (scripts/train-nets:137-143) -- batch sampling,
augmentation, forward, routing, loss, gradients, TALR scaling, momentum
update -- becomes ONE compiled XLA program per net. Schedules are pure
functions of the step counter traced into the program (the reference feeds
them through placeholders each step, scripts/train-nets:24-26,141-143).

Evaluation over a full split compiles to a single `lax.scan` over padded
fixed-shape batches with a validity mask, reproducing the reference's exact
sum/count statistics (scripts/lib/desc.py:10-22) without ragged shapes."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..data.augment import augmented_batch, augment_presampled
from .net import Ctx
from ..ops import config as ops_config
from .optim import (talr_scale_grads, momentum_init, momentum_update,
                    tree_l2_decay)
from .stats import state_stats


class Schedules:
    """Per-step hyper schedules, the analogue of the reference's
    `expt.hypers(net, t)` feeds (scripts/train-nets:24-26).

    lr:     t -> learning rate (always fed; reference lambda_lrn)
    tau:    t -> routing temperature, or None to use the net's default hyper
    k_cpt_sample: array of k_cpt values to sample per-example each batch
            (train-adaptive-nets:24-27), or None for the net's static k_cpt.
    """

    def __init__(self, lr=lambda t: 1e-3, tau=None, k_cpt_sample=None):
        self.lr = lr
        self.tau = tau
        self.k_cpt_sample = (None if k_cpt_sample is None
                             else np.asarray(k_cpt_sample, np.float32))


def _hyper(net, name, default):
    # Python NFKC-normalizes identifiers, so a hyper passed as the kwarg
    # ϵ=... (U+03F5) lands in vars(net.hypers) under ε (U+03B5); string
    # lookups must normalize the same way or custom values of such hypers
    # are silently replaced by the default.
    import unicodedata
    return getattr(net.hypers, unicodedata.normalize("NFKC", name), default)


def make_train_step(net, batch_size, schedules, r_shift=4, mesh=None):
    """Build the jitted train step.

    step(params, state, vel, t, rng, x0_tr, y_tr, m_sym)
        -> (params, state, vel, c_tot)

    params/state/vel buffers are donated -- updates are in-place in HBM.

    With a mesh, the sampled batch is shard-constrained over the 'data' axis
    so the step runs data-parallel across the mesh; XLA emits the gradient
    all-reduce over ICI (params follow their own input shardings -- use
    mpnn_tpu.parallel.shard_params to place them)."""
    step = _train_step_body(net, batch_size, schedules, r_shift, mesh)
    return jax.jit(step, donate_argnums=(0, 1, 2))


def _step_pieces(net, batch_size, schedules, r_shift, mesh, presampled):
    """Shared per-step plumbing for the pytree and flat step bodies:
    (batch_ctx, loss_and_grads) closures."""
    eps_rte = float(_hyper(net, "ϵ", 1e-6))
    tau_default = float(_hyper(net, "τ", 1.0))
    k_cpt_static = _hyper(net, "k_cpt", 0.0)

    def batch_ctx(t, rng, x0_tr, y_tr, m_sym, k_cpt):
        key = jax.random.fold_in(rng, t)
        k_aug, k_drop, k_cpt_key = jax.random.split(key, 3)
        if presampled:
            xb, yb = augment_presampled(k_aug, x0_tr, y_tr, m_sym, r_shift)
        else:
            xb, yb = augmented_batch(k_aug, x0_tr, y_tr, m_sym, batch_size,
                                     r_shift)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bs = NamedSharding(mesh, P("data"))
            xb = jax.lax.with_sharding_constraint(xb, bs)
            yb = jax.lax.with_sharding_constraint(yb, bs)
        tau = schedules.tau(t) if schedules.tau is not None else tau_default
        if schedules.k_cpt_sample is not None:
            k_cpt = jax.random.choice(
                k_cpt_key, jnp.asarray(schedules.k_cpt_sample),
                (batch_size,))
        elif k_cpt is None:
            # Fall back to the net's static hyper (baked into the graph).
            # Callers that pass k_cpt as a traced scalar instead share ONE
            # compiled program across a whole k_cpt sweep.
            k_cpt = k_cpt_static
        return xb, yb, Ctx(train=True, rng=k_drop, tau=tau, eps=eps_rte,
                           k_cpt=k_cpt)

    def loss_and_grads(params, state, xb, yb, ctx):
        def loss_fn(p):
            recs, new_state = net.forward(p, state, xb, yb, ctx)
            c_tot = net.loss(recs, batch_size, ctx)
            p_tr_by_uid = {
                str(l._uid): recs[l].p_tr
                for l in net.layers if recs[l].p_tr is not None}
            return c_tot, (new_state, p_tr_by_uid)

        if ops_config.remat_policy is not None:
            # Recompute activations in backward instead of storing them
            # (ops.config.set_remat; the step is HBM-bandwidth-bound).
            if ops_config.remat_policy == "dots":
                loss_fn = jax.checkpoint(
                    loss_fn, policy=jax.checkpoint_policies.dots_saveable)
            else:
                loss_fn = jax.checkpoint(loss_fn)
        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    return batch_ctx, loss_and_grads


def _train_step_body(net, batch_size, schedules, r_shift=4, mesh=None,
                     presampled=False):
    """The (un-jitted) single train step; shared by make_train_step and the
    scan-chained make_train_loop's mesh path.

    With presampled=True the x0_tr/y_tr arguments are the step's
    already-gathered (B, ...) batch and only flip+shift augmentation runs
    here (the loop gathers whole chunks at once -- see make_train_loop)."""
    mu = float(_hyper(net, "μ_lrn", 0.9))
    alpha_rtr = float(_hyper(net, "α_rtr", 1.0))
    talr = bool(_hyper(net, "talr", True))
    batch_ctx, loss_and_grads = _step_pieces(net, batch_size, schedules,
                                             r_shift, mesh, presampled)

    def step(params, state, vel, t, rng, x0_tr, y_tr, m_sym, k_cpt=None):
        xb, yb, ctx = batch_ctx(t, rng, x0_tr, y_tr, m_sym, k_cpt)
        (c_tot, (new_state, p_tr_by_uid)), grads = loss_and_grads(
            params, state, xb, yb, ctx)

        if ops_config.analytic_l2:
            # Weight-L2 grad + value added here instead of ~1 reduction per
            # weight tensor in the traced loss (ops.config.analytic_l2).
            grads, c_l2 = tree_l2_decay(net, params, grads, p_tr_by_uid)
            c_tot = c_tot + c_l2
        if net.uses_expectation_optimizer:
            grads = talr_scale_grads(net, grads, p_tr_by_uid,
                                     alpha_rtr=alpha_rtr, talr=talr)

        lr = schedules.lr(t)
        new_params, new_vel = momentum_update(params, vel, grads, lr, mu)
        return new_params, new_state, new_vel, c_tot

    return step


_SAMPLE_STREAM = 7919  # fold_in tag separating batch sampling from aug keys


def _chunk_sampler(rng, batch_size, x0_tr, y_tr):
    """sample_span(t_first, n): ONE bandwidth-bound gather of n batches
    (n static) -- per-step 128-row gathers are latency-bound on TPU. Under
    a bf16 policy the image chunk is stored bf16 (augmentation's selection
    matmuls are exact in any dtype; the net casts at its entry anyway).
    Shared by make_train_loop and make_sweep_train_loop."""

    def sample_span(t_first, n):
        k = jax.random.fold_in(jax.random.fold_in(rng, _SAMPLE_STREAM),
                               t_first)
        idx = jax.random.randint(k, (n * batch_size,), 0, x0_tr.shape[0])
        xc = jnp.take(x0_tr, idx, axis=0).reshape(
            (n, batch_size) + x0_tr.shape[1:])
        if ops_config.compute_dtype is not None:
            xc = xc.astype(ops_config.compute_dtype)
        yc = jnp.take(y_tr, idx, axis=0).reshape(
            (n, batch_size) + y_tr.shape[1:])
        return xc, yc

    return sample_span


def make_train_loop(net, batch_size, schedules, r_shift=4, mesh=None,
                    sample_tile=256):
    """Scan-chained training: run n_steps train steps in ONE device call.

    loop(params, state, vel, t0, rng, x0_tr, y_tr, m_sym, n_steps)
        -> (params, state, vel, losses[n_steps])

    The whole chunk compiles to a single XLA program (`lax.scan` over the
    step body), which amortizes per-call dispatch overhead -- measured at
    ~2 ms through a tunneled TPU, i.e. larger than the b128 step's compute
    itself. This is also simply the TPU-native shape for a training run: the
    reference crosses host<->device every iteration
    (scripts/train-nets:141-143); here a t_log-sized span of training is one
    program. n_steps is static (one compile per distinct chunk size).

    Batch sampling is TILED: every `sample_tile` steps, ONE large gather
    pulls tile*B uniform rows from the train split, and the inner scan
    reads contiguous (B, ...) slices from it. Per-step 128-row gathers are
    latency-bound (~175us measured, ~11x HBM-bandwidth time); one 32k-row
    gather runs at bandwidth and amortizes to ~2us/step. The index
    distribution (iid uniform with replacement) is unchanged
    (reference scripts/lib/data.py:24-27).

    Params stay a PYTREE through the scan: an experiment raveling them into
    one flat (P,) buffer (to fuse the ~350 per-tensor TALR/momentum update
    ops) measured 10x SLOWER -- every conv weight sliced out of a flat
    buffer needs a re-layout copy each step, which costs far more than the
    small update fusions save. Do not re-attempt without solving layouts.

    Under ops.config.stacked_tails the carry runs in net.pack_tree's PACKED
    layout: group members' params/state/vel are stacked ONCE at chunk entry
    and sliced back at chunk exit, so each step's forward consumes the
    stacks directly instead of re-stacking (and un-stacking, in backward)
    the tail params every step. Host-facing arguments/results stay in the
    plain node layout -- serdes/stats/eval never see packed trees.
    """
    step = _train_step_body(net, batch_size, schedules, r_shift, mesh,
                            presampled=True)

    def loop(params, state, vel, t0, rng, x0_tr, y_tr, m_sym, n_steps,
             k_cpt=None):
        # Meshless only: the mesh path places params per-node
        # (parallel.shard_params) and the packed group stacks' scan-carry
        # shardings would be GSPMD-inferred rather than pinned, risking a
        # silent gather of grouped tails onto one device for a whole
        # chunk. Under a mesh, stacked_tails falls back to the per-step
        # stacking inside forward() (still correct, never carried).
        pack = (mesh is None and ops_config.stacked_tails
                and bool(net._stack_plan))
        if pack:
            params, state, vel = (net.pack_tree(t)
                                  for t in (params, state, vel))
        params, state, vel, cs = _tiled_scan_loop(
            step, batch_size, sample_tile, (params, state, vel), t0, rng,
            x0_tr, y_tr, m_sym, n_steps, k_cpt)
        if pack:
            params, state, vel = (net.unpack_tree(t)
                                  for t in (params, state, vel))
        return params, state, vel, cs

    return jax.jit(loop, static_argnums=(8,), donate_argnums=(0, 1, 2))


def _tiled_scan_loop(step, batch_size, sample_tile, carry, t0, rng,
                     x0_tr, y_tr, m_sym, n_steps, k_cpt):
    """The tiled-sampling lax.scan chain shared by make_train_loop and
    make_sweep_train_loop: every `sample_tile` steps one bandwidth-bound
    gather pulls the span's batches, and an inner scan runs `step` over
    them. Returns (params, state, vel, losses[n_steps, ...])."""
    sample_span = _chunk_sampler(rng, batch_size, x0_tr, y_tr)

    def body(carry, inp):
        p, s, v = carry
        t, xb, yb = inp
        p, s, v, c = step(p, s, v, t, rng, xb, yb, m_sym, k_cpt)
        return (p, s, v), c

    def run_span(carry, t_first, n):
        xc, yc = sample_span(t_first, n)
        ts = t_first + jnp.arange(n)
        return jax.lax.scan(body, carry, (ts, xc, yc))

    tile = min(sample_tile, n_steps)
    n_full, rem = divmod(n_steps, tile)
    cs_parts = []
    if n_full:
        carry, cs = jax.lax.scan(
            lambda c, t_first: run_span(c, t_first, tile),
            carry, t0 + tile * jnp.arange(n_full))
        cs_parts.append(cs.reshape((n_full * tile,) + cs.shape[2:]))
    if rem:
        carry, cs = run_span(carry, t0 + n_full * tile, rem)
        cs_parts.append(cs)
    params, state, vel = carry
    cs = cs_parts[0] if len(cs_parts) == 1 else jnp.concatenate(cs_parts)
    return params, state, vel, cs


def stack_trees(trees):
    """Stack a list of identically-structured pytrees along a new leading
    axis (the sweep axis of make_sweep_train_loop)."""
    return jax.tree.map(lambda *a: jnp.stack(a), *trees)


def unstack_tree(tree, i):
    """Slice sweep member i back out of a stacked pytree."""
    return jax.tree.map(lambda a: a[i], tree)


def make_sweep_train_loop(net, batch_size, schedules, r_shift=4,
                          sample_tile=256, mesh=None):
    """Train a whole k_cpt SWEEP of same-architecture nets in one program.

    loop(params_s, state_s, vel_s, t0, rng, x0_tr, y_tr, m_sym, n_steps,
         k_cpts) -> (params_s, state_s, vel_s, losses[n_steps, n_nets])

    The reference's AC/CR experiments train 8 nets that differ ONLY in the
    k_cpt scalar (scripts/train-nets:31-35, arch_and_hypers.py:15), one
    after another. Here the train step is vmapped over stacked
    (params, state, vel, k_cpt): the b128 step is op-dispatch-bound on TPU
    (~500 small kernels of ~1-2us; convs are ~3% of the step), so folding 8
    nets into each kernel multiplies throughput by nearly the sweep width.

    All sweep members see the SAME sampled+augmented batch stream (common
    random numbers -- each net still trains on exact iid uniform samples;
    only the cross-net correlation differs from serial training, which the
    reference never relies on). Inits and k_cpt differ per member.

    With a ('sweep', 'data') mesh (parallel.make_sweep_mesh), the stacked
    trees must be placed via parallel.shard_sweep_tree: each net's params,
    state, velocity, and activations live on one 'sweep' shard (zero
    cross-net collectives -- the v5e-8 deployment shape is 8 nets on 8
    chips), and when the mesh has a data axis >1 each per-step batch is
    additionally split over 'data' (gradient psum over 'data' only).
    Sweep members must tile the 'sweep' axis. Validated vs the meshless
    path in tests/test_parallel.py.

    ops.config.stacked_tails composes with the MESHLESS sweep (measured
    on-chip: neutral for the flagship chain's leaf-only groups, a 67%
    regression for the 8-TREE sweep's conv-bearing tails -- docs/perf.md)
    but NOT with a sweep mesh: JAX's conv batching rule raises
    NotImplementedError when the weights carry two vmap batch dims under
    an explicit out-sharding (jax/_src/lax/convolution.py batching with
    out_sharding). Fail loud here (and again at trace time, since the
    flag is mutable) rather than deep in the trace."""
    def _reject_stacked_mesh():
        if mesh is not None and ops_config.stacked_tails:
            raise ValueError(
                "stacked_tails cannot compose with a sweep mesh (upstream "
                "JAX conv batching limitation under double-vmap + "
                "sharding); for TREE sweeps it is also a measured "
                "regression even meshless -- see docs/perf.md. Disable "
                "ops.config.stacked_tails (drop --stacked-tails) for "
                "--vmap-sweep runs.")

    _reject_stacked_mesh()
    step = _train_step_body(net, batch_size, schedules, r_shift, None,
                            presampled=True)
    # axes: params, state, vel mapped; t, rng, xb, yb, m_sym shared;
    # k_cpt per-net.
    vstep = jax.vmap(step, in_axes=(0, 0, 0, None, None, None, None, None,
                                    0))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sweep_sh = NamedSharding(mesh, P("sweep"))
        base_vstep = vstep

        def vstep(p, s, v, t, rng, xb, yb, m_sym, k):
            # The flag is mutable global config: re-check at trace time so
            # a construct-then-enable sequence still fails loud instead of
            # dying in JAX's conv batching rule.
            _reject_stacked_mesh()
            # Pin the carried trees to the per-net placement so GSPMD
            # never gathers a whole net onto one device mid-scan; the
            # shared batch is split over 'data' (no-op when data=1).
            p, s, v = (jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, sweep_sh), t_)
                for t_ in (p, s, v))
            bs = NamedSharding(mesh, P("data"))
            xb = jax.lax.with_sharding_constraint(xb, bs)
            yb = jax.lax.with_sharding_constraint(yb, bs)
            return base_vstep(p, s, v, t, rng, xb, yb, m_sym, k)

    def loop(params_s, state_s, vel_s, t0, rng, x0_tr, y_tr, m_sym,
             n_steps, k_cpts):
        # Pre-stack grouped tails across the chunk (see make_train_loop);
        # the member axis lands AFTER the leading sweep axis (axis=1) so
        # the per-net vmap still maps axis 0 of every carried leaf.
        pack = (mesh is None and ops_config.stacked_tails
                and bool(net._stack_plan))
        if pack:
            params_s, state_s, vel_s = (net.pack_tree(t, axis=1)
                                        for t in (params_s, state_s,
                                                  vel_s))
        params_s, state_s, vel_s, cs = _tiled_scan_loop(
            vstep, batch_size, sample_tile, (params_s, state_s, vel_s),
            t0, rng, x0_tr, y_tr, m_sym, n_steps, k_cpts)
        if pack:
            params_s, state_s, vel_s = (net.unpack_tree(t, axis=1)
                                        for t in (params_s, state_s,
                                                  vel_s))
        return params_s, state_s, vel_s, cs

    return jax.jit(loop, static_argnums=(8,), donate_argnums=(0, 1, 2))


def _eval_batch_fn(net, batch_size, mesh=None):
    """Masked per-batch stat-sum function shared by the serial and sweep
    evaluators (the reference's per-batch Session.run of state_tensors,
    scripts/lib/desc.py:10-22)."""
    eps_rte = float(_hyper(net, "ϵ", 1e-6))

    def eval_batch(params, state, x0b, yb, maskb, tau, k_cpt, rng=None):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            bs = NamedSharding(mesh, P("data"))
            x0b = jax.lax.with_sharding_constraint(x0b, bs)
            yb = jax.lax.with_sharding_constraint(yb, bs)
        # rng: per-batch key so non-mode-gated Dropout (λ<1) applies at
        # eval exactly like the reference's un-gated tf.nn.dropout
        # (scripts/lib/layer_types.py:212-217); None disables it. All
        # registry nets use λ=1, where Dropout is the identity either way.
        ctx = Ctx(train=False, rng=rng, tau=tau, eps=eps_rte, k_cpt=k_cpt)
        recs, _ = net.forward(params, state, x0b, yb, ctx)
        net.route_for_stats(recs, batch_size, ctx)
        stats = state_stats(net, recs, yb)
        # Mask out padding and sum over the batch axis.
        def msum(v):
            m = maskb.reshape((-1,) + (1,) * (v.ndim - 1))
            return jnp.sum(v * m, axis=0)
        return {k: msum(v) for k, v in stats.items()}

    return eval_batch


def _has_active_dropout(net):
    """True if any (sub)layer is a Dropout with keep-prob < 1. Only then do
    the evaluators thread per-batch RNG keys (dropout is NOT mode-gated in
    the reference, scripts/lib/layer_types.py:212-217); gating this keeps
    the eval HLO -- and the persistent compile cache -- unchanged for the
    dropout-free registry nets."""
    from ..ops.layers import Dropout
    from .net import _all_sublayers
    return any(isinstance(sub, Dropout) and sub.hypers.λ < 1
               for l in net.layers for sub in _all_sublayers(l))


def make_eval_split_fn(net, batch_size, mesh=None):
    """Build a jitted full-split evaluator.

    eval_split(params, state, x0s, ys, masks, tau, k_cpt) -> dict of
    per-split SUMS of the per-example stats (divide by the true example
    count on the host to get the reference's dataset means,
    scripts/lib/desc.py:10-22). x0s/ys/masks are (n_batches, B, ...) padded
    stacks from Dataset.padded_split."""
    return _scan_split_fn(_eval_batch_fn(net, batch_size, mesh),
                          _has_active_dropout(net))


def _scan_split_fn(eval_fn, use_rng):
    """Jitted scan of a per-batch stat-sum function over a padded split,
    shared by the serial and sweep evaluators. Per-batch rng keys are
    threaded only when use_rng (see _has_active_dropout); `eval_key` seeds
    them -- callers pass fold_in(seed_key, t) so every eval draws FRESH
    dropout masks (the reference samples fresh tf.nn.dropout noise per
    Session.run) while staying deterministic per run. For dropout-free nets
    eval_key is ignored (a None pytree: the compiled program -- and the
    persistent compile cache -- is unchanged)."""

    def eval_split(params, state, x0s, ys, masks, tau, k_cpt,
                   eval_key=None):
        def body(carry, inp):
            x0b, yb, mb = inp[:3]
            rng = inp[3] if use_rng else None
            sums = eval_fn(params, state, x0b, yb, mb, tau, k_cpt, rng)
            return jax.tree.map(jnp.add, carry, sums), None

        xs = (x0s, ys, masks)
        if use_rng:
            key = (eval_key if eval_key is not None
                   else jax.random.PRNGKey(0))
            xs += (jax.random.split(key, x0s.shape[0]),)
        shapes = jax.eval_shape(eval_fn, params, state, x0s[0], ys[0],
                                masks[0], tau, k_cpt,
                                xs[3][0] if use_rng else None)
        init = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        sums, _ = jax.lax.scan(body, init, xs)
        return sums

    return jax.jit(eval_split)


def make_sweep_eval_split_fn(net, batch_size):
    """Vmapped full-split evaluator for a k_cpt sweep: one scan over the
    split evaluates ALL sweep members per batch (the serial path pays the
    whole-split sweep once per net). Returned sums carry a leading
    (n_nets,) axis."""
    veval = jax.vmap(_eval_batch_fn(net, batch_size),
                     in_axes=(0, 0, None, None, None, None, 0, None))
    return _scan_split_fn(veval, _has_active_dropout(net))


def init_training(net, seed=0):
    """(params, state, vel) for a fresh net."""
    params, state = net.init(jax.random.PRNGKey(seed))
    vel = momentum_init(params)
    return params, state, vel
