"""Net base class: a static routing tree compiled into one XLA program.

The reference's `Net` (scripts/lib/net_types.py:43-79) owns a root layer and
recursively links layer -> router -> sinks into a TF graph. Here the tree is
static Python structure; `forward` is a pure function over (params, state)
pytrees that returns a per-node record table, and each net type assembles its
loss from those records. Everything -- including routing probability
propagation -- happens inside jit; routing is masked dense execution
(all branches always run; see SURVEY.md section 3.2).

Pytree layout, mirroring the tree (one dict per tree node):

    node_params = {"layer": <layer params>, "router": <router params or {}>,
                   "sinks": [child node_params...]}

and identically for state. This makes the TALR per-node gradient rescaling
(mpnn_tpu.models.optim) a trivial structural walk.
"""

import itertools
from types import SimpleNamespace as Ns

import jax
import jax.numpy as jnp

from ..ops.layers import NoOp, nfkc_hypers


class Ctx(Ns):
    """Per-call context: `train` is a STATIC Python bool (two compiled
    programs replace the reference's string mode placeholder,
    scripts/lib/net_types.py:52); `rng` is a PRNG key or None; `tau`,
    `eps`, `k_cpt` are traced scalars / (B,) arrays fed per step like the
    reference's placeholders-with-defaults (scripts/lib/net_types.py:139-145).
    """

    def __init__(self, train=False, rng=None, tau=1.0, eps=1e-6, k_cpt=0.0):
        super().__init__(train=train, rng=rng, tau=tau, eps=eps, k_cpt=k_cpt)


class Rec(Ns):
    """Per-node forward record (the functional analogue of the attributes the
    reference hangs on layer objects at link time: x, c_err, c_mod, p_tr,
    p_ev, c_ev, ...)."""

    def __init__(self):
        super().__init__(
            x=None, c_err=0.0, c_mod=0.0, delta_cor=None,
            router_x=None, router_c_mod=0.0,
            p_tr=None, p_ev=None, pi_tr=None, pi_ev=None,
            c_ev=None, c_opt=None, c_cre=0.0)


def n_leaves(layer):
    """Number of leaves under a tree node (reference scripts/lib/net_types.py:14-16)."""
    if len(layer.sinks) == 0:
        return 1
    return sum(n_leaves(s) for s in layer.sinks)


def _hyper_sig(v):
    """Hashable congruence signature for one hyper value."""
    import numpy as np
    if isinstance(v, (np.ndarray, jnp.ndarray)):
        a = np.asarray(v)
        return ("ndarray", a.shape, str(a.dtype), hash(a.tobytes()))
    return repr(v)


def _subtree_nodes(node):
    """Preorder tree-node list of `node`'s subtree (sinks only)."""
    out = [node]
    for s in node.sinks:
        out.extend(_subtree_nodes(s))
    return out


def _all_sublayers(layer):
    """Every Layer object reachable from `layer` through comps and router
    (NOT sinks) -- the unit whose params share one TALR scale
    (reference params_list_rec, scripts/lib/net_types.py:18-22)."""
    yield layer
    for c in layer.comps:
        yield from _all_sublayers(c)
    if layer.router is not None:
        yield from _all_sublayers(layer.router)


class Net:
    default_hypers = dict(x0_shape=(), y_shape=())

    def __init__(self, root=None, **hypers):
        self.root = root if root is not None else NoOp()
        self.hypers = Ns(**{**dict(type(self).default_hypers),
                            **nfkc_hypers(hypers)})
        self.params = Ns()  # net-level params: always empty, kept for
        #                     checkpoint-schema parity (serdes.py:40-44)
        self.build()

    # ------------------------------------------------------------------ build

    def _router_in_shape(self, node):
        """Shape fed to a node's router = the node's output shape; ActorNet /
        CriticNet override this when dyn_k_cpt appends the cost feature
        (reference scripts/lib/net_types.py:146-160)."""
        return node.out_shape

    def build(self):
        x0_shape = tuple(self.hypers.x0_shape)

        def build_node(node, x_shape):
            node.build(x_shape)
            if node.router is not None:
                node.router.build(self._router_in_shape(node))
            for s in node.sinks:
                build_node(s, node.out_shape)

        build_node(self.root, x0_shape)

        # Assign stable integer uids to every layer object (after build, so
        # build-created comps like MultiscaleBatchNorm's are included). Tree
        # nodes get preorder-consecutive uids used as stat keys.
        counter = itertools.count()
        for node in self.layers:
            for sub in _all_sublayers(node):
                sub._uid = next(counter)
        self._n_leaves_root = n_leaves(self.root)
        self._compute_stack_plan()

    # -------------------------------------------- congruent-subtree batching

    def _layer_sig(self, layer, in_shape, memo):
        """Recursive structural-congruence signature: two layers with equal
        signatures build identical param/state/compute structure (class,
        hypers, input shape, comps chain, router, sink subtrees). Used to
        find shared-shape subtrees (e.g. dr_tree's 8 identical 5-deep tails,
        experiments.py:126-143) that can be evaluated as ONE vmapped
        template instead of unrolled in the trace."""
        if id(layer) in memo:
            return memo[id(layer)]
        h = tuple(sorted((k, _hyper_sig(v))
                         for k, v in vars(layer.hypers).items()))
        shape = in_shape
        comp_sigs = []
        for c in layer.comps:
            comp_sigs.append(self._layer_sig(c, shape, memo))
            shape = c.out_shape
        r_sig = (self._layer_sig(layer.router, self._router_in_shape(layer),
                                 memo)
                 if layer.router is not None else None)
        s_sigs = tuple(self._layer_sig(s, layer.out_shape, memo)
                       for s in layer.sinks)
        sig = (type(layer).__name__, h, repr(in_shape), repr(layer.out_shape),
               tuple(comp_sigs), r_sig, s_sigs)
        memo[id(layer)] = sig
        return sig

    def _compute_stack_plan(self):
        """Greedy maximal grouping of congruent non-root subtrees. Each plan
        entry is a group of >=2 disjoint, structurally-identical subtrees;
        forward() (when ops.config.stacked_tails is on) evaluates each group
        as one vmapped template over stacked params/state/inputs. Selection
        maximizes (group_width - 1) * subtree_size, i.e. trace-size saved."""
        memo = {}
        classes = {}

        def walk(node, in_shape, is_root):
            if not is_root:
                classes.setdefault(
                    self._layer_sig(node, in_shape, memo), []).append(node)
            for s in node.sinks:
                walk(s, node.out_shape, False)

        walk(self.root, tuple(self.hypers.x0_shape), True)

        cands = [(members, len(_subtree_nodes(members[0])))
                 for members in classes.values() if len(members) >= 2]
        cands.sort(key=lambda c: (len(c[0]) - 1) * c[1], reverse=True)
        covered, plan = set(), []
        for members, _size in cands:
            elig = [m for m in members
                    if not any(id(n) in covered for n in _subtree_nodes(m))]
            if len(elig) < 2:
                continue
            plan.append({"members": elig,
                         "preorders": [_subtree_nodes(m) for m in elig]})
            for m in elig:
                covered.update(id(n) for n in _subtree_nodes(m))
        self._stack_plan = plan

    # -------------------------------------------- packed (pre-stacked) layout

    def _member_at(self):
        """id(member node) -> (group index, member index) for the plan."""
        return {id(m): (gi, mi)
                for gi, g in enumerate(self._stack_plan)
                for mi, m in enumerate(g["members"])}

    def packed_member_ids(self):
        """{id(member node)} over all stack-plan groups; the node slots a
        packed-layout walk must skip (their subtrees live in "groups")."""
        return {id(m) for g in self._stack_plan for m in g["members"]}

    def pack_tree(self, tree, axis=0):
        """Re-layout a node-structured pytree (params/state/vel/grads all
        share the node-dict structure) into the PACKED form

            {"tree": <node tree with each group member's subtree replaced
                      by an empty dict>,
             "groups": [<one member-stacked subtree per plan group>]}

        so scan-chained training can carry group members' params PRE-STACKED
        and forward() skips the per-step jnp.stack/unstack copies of the
        tail params (the measured cost that made stacked_tails regress 67%
        under the sweep vmap -- docs/perf.md). `axis` is where the member
        axis lands in the stacked leaves: 0 normally, 1 when the leaves
        already carry a leading sweep axis (make_sweep_train_loop)."""
        member_at = self._member_at()
        groups = [[None] * len(g["members"]) for g in self._stack_plan]

        def walk(node, t):
            out = {"layer": t["layer"], "router": t["router"], "sinks": []}
            for i, snk in enumerate(node.sinks):
                at = member_at.get(id(snk))
                if at is not None:
                    groups[at[0]][at[1]] = t["sinks"][i]
                    out["sinks"].append({})
                else:
                    out["sinks"].append(walk(snk, t["sinks"][i]))
            return out

        tree2 = walk(self.root, tree)
        g_st = [jax.tree_util.tree_map(
                    lambda *l: jnp.stack(l, axis=axis), *g)
                for g in groups]
        return {"tree": tree2, "groups": g_st}

    def unpack_tree(self, packed, axis=0):
        """Inverse of pack_tree: slice each member back out of its group
        stack and graft it into the node tree."""
        member_at = self._member_at()

        def walk(node, t):
            out = {"layer": t["layer"], "router": t["router"], "sinks": []}
            for i, snk in enumerate(node.sinks):
                at = member_at.get(id(snk))
                if at is not None:
                    gi, mi = at
                    out["sinks"].append(jax.tree_util.tree_map(
                        lambda a, _mi=mi: jax.lax.index_in_dim(
                            a, _mi, axis=axis, keepdims=False),
                        packed["groups"][gi]))
                else:
                    out["sinks"].append(walk(snk, t["sinks"][i]))
            return out

        return walk(self.root, packed["tree"])

    @staticmethod
    def is_packed(tree):
        """True for pytrees in pack_tree's {"tree", "groups"} layout."""
        return isinstance(tree, dict) and "groups" in tree

    # -------------------------------------------------------------- iterators

    @property
    def layers(self):
        """Preorder tree-node iterator (reference scripts/lib/net_types.py:65-72)."""
        def all_in_tree(layer):
            yield layer
            for sink in layer.sinks:
                yield from all_in_tree(sink)
        yield from all_in_tree(self.root)

    @property
    def leaves(self):
        return (l for l in self.layers if len(l.sinks) == 0)

    @property
    def switches(self):
        return (l for l in self.layers if len(l.sinks) > 1)

    # ------------------------------------------------------------- init

    def init(self, key):
        """Initialize (params, state) pytrees for the whole tree."""
        def init_node(node, key, x_shape):
            keys = jax.random.split(key, 2 + len(node.sinks))
            p = {"layer": node.init(keys[0], x_shape), "router": {},
                 "sinks": []}
            s = {"layer": node.init_state(x_shape), "router": {},
                 "sinks": []}
            if node.router is not None:
                rshape = self._router_in_shape(node)
                p["router"] = node.router.init(keys[1], rshape)
                s["router"] = node.router.init_state(rshape)
            for i, snk in enumerate(node.sinks):
                ps, ss = init_node(snk, keys[2 + i], node.out_shape)
                p["sinks"].append(ps)
                s["sinks"].append(ss)
            return p, s

        return init_node(self.root, key, tuple(self.hypers.x0_shape))

    # ------------------------------------------------------------- forward

    def _router_input(self, x, ctx):
        """Transform a node's output into its router's input; identity here,
        overridden by dyn_k_cpt nets."""
        return x

    def _apply_one(self, node, p, s, x, y, ctx):
        """Apply one tree node + its router. Returns (field dict, new state
        subtree with empty sinks). The dict is pytree-compatible (used both
        for direct Rec filling and under vmap in the stacked-tails path)."""
        x_out, ns_layer, aux = node.apply(p["layer"], s["layer"], x, y, ctx)
        o = {"x": x_out, "c_err": aux.c_err, "c_mod": aux.c_mod,
             "delta_cor": aux.delta_cor, "router_x": None,
             "router_c_mod": 0.0}
        ns = {"layer": ns_layer, "router": s["router"], "sinks": []}
        if node.router is not None:
            x_rte = self._router_input(x_out, ctx)
            r_x, ns_rtr, r_aux = node.router.apply(
                p["router"], s["router"], x_rte, y, ctx)
            o["router_x"] = r_x.astype(jnp.float32)
            o["router_c_mod"] = r_aux.c_mod
            ns["router"] = ns_rtr
        return o, ns

    def _walk_subtree(self, root, p, s, x, y, ctx, outs):
        """Serially trace `root`'s subtree, appending per-node field dicts to
        `outs` in preorder; returns the new-state subtree."""
        o, ns = self._apply_one(root, p, s, x, y, ctx)
        outs.append(o)
        for i, snk in enumerate(root.sinks):
            ns["sinks"].append(self._walk_subtree(
                snk, p["sinks"][i], s["sinks"][i], o["x"], y, ctx, outs))
        return ns

    @staticmethod
    def _rec_from(o):
        rec = Rec()
        rec.x, rec.c_err, rec.c_mod = o["x"], o["c_err"], o["c_mod"]
        rec.delta_cor = o["delta_cor"]
        rec.router_x, rec.router_c_mod = o["router_x"], o["router_c_mod"]
        return rec

    def forward(self, params, state, x0, y, ctx):
        """Run the whole tree densely; returns ({node: Rec}, new_state).

        Under a bf16 compute policy the input casts to bf16 HERE and
        activations stay bf16 through the whole tree (the train step is
        HBM-bandwidth-bound; see ops.layers.conv_same). Router logits are
        recorded in fp32: every consumer (routing eps-mixture -- whose
        floors sit at ~1e-7, SURVEY.md section 7 "hard parts" --, critic
        regression, c_dec, x_rte stats) is precision-sensitive and tiny.

        When ops.config.stacked_tails is on, groups of congruent subtrees
        (the build-time _stack_plan) are evaluated as ONE vmapped template
        over stacked params/state/inputs instead of being unrolled node by
        node in the trace; the stacked results are sliced back into the
        per-node record table, so routing/loss/stats code is unaffected.

        params/state may also arrive in pack_tree's PACKED layout (group
        members' params carried pre-stacked, member axis leading): then the
        group runs consume the stacks directly -- no per-call jnp.stack of
        tail params -- and new_state is returned packed. The scan-chained
        train loops pack once per chunk instead of once per step."""
        from ..ops import config
        packed = self.is_packed(params)
        if packed:
            assert self.is_packed(state), "params packed but state is not"
            assert config.stacked_tails, \
                "packed params require ops.config.stacked_tails"
        if config.compute_dtype is not None:
            x0 = x0.astype(config.compute_dtype)
        plan = self._stack_plan if (config.stacked_tails or packed) else []
        group_of = self._member_at() if plan else {}
        # Per group member: (params, state, input, parent sinks-list, index).
        pend = [[None] * len(g["members"]) for g in plan]
        recs = {}

        def fwd(node, p, s, x):
            o, ns = self._apply_one(node, p, s, x, y, ctx)
            recs[node] = self._rec_from(o)
            for i, snk in enumerate(node.sinks):
                at = group_of.get(id(snk))
                if at is not None:
                    # Packed: the member slot stays an empty dict; unpacked:
                    # filled by the group run below.
                    ns["sinks"].append({} if packed else None)
                    pend[at[0]][at[1]] = (
                        None if packed else p["sinks"][i],
                        None if packed else s["sinks"][i],
                        o["x"], ns["sinks"], i)
                else:
                    ns["sinks"].append(
                        fwd(snk, p["sinks"][i], s["sinks"][i], o["x"]))
            return ns

        new_tree = fwd(self.root, params["tree"] if packed else params,
                       state["tree"] if packed else state, x0)
        ns_groups = []

        for gi, g in enumerate(plan):
            members = g["members"]
            template = members[0]
            stack = lambda *leaves: jnp.stack(leaves)
            if packed:
                p_st, s_st = params["groups"][gi], state["groups"][gi]
            else:
                p_st = jax.tree_util.tree_map(
                    stack, *[e[0] for e in pend[gi]])
                s_st = jax.tree_util.tree_map(
                    stack, *[e[1] for e in pend[gi]])
            x_st = jax.tree_util.tree_map(stack, *[e[2] for e in pend[gi]])

            def run(p, s, x, rng, _template=template):
                c = Ctx(train=ctx.train, rng=rng, tau=ctx.tau, eps=ctx.eps,
                        k_cpt=ctx.k_cpt)
                outs = []
                ns = self._walk_subtree(_template, p, s, x, y, c, outs)
                return outs, ns

            if ctx.rng is None:
                outs_st, ns_st = jax.vmap(
                    lambda p, s, x: run(p, s, x, None))(p_st, s_st, x_st)
            else:
                # Distinct per-member dropout streams (the serial path folds
                # each member's own uids; here the member root uid is folded
                # on top of the shared template-relative folds).
                keys = jnp.stack([jax.random.fold_in(ctx.rng, m._uid)
                                  for m in members])
                outs_st, ns_st = jax.vmap(run)(p_st, s_st, x_st, keys)

            for mi, m in enumerate(members):
                take = lambda a, _mi=mi: a[_mi]
                for o_st, node in zip(outs_st, g["preorders"][mi]):
                    recs[node] = self._rec_from(
                        jax.tree_util.tree_map(take, o_st))
                if not packed:
                    sinks_list, idx = pend[gi][mi][3], pend[gi][mi][4]
                    sinks_list[idx] = jax.tree_util.tree_map(take, ns_st)
            if packed:
                ns_groups.append(ns_st)
        new_state = ({"tree": new_tree, "groups": ns_groups} if packed
                     else new_tree)
        return recs, new_state

    # ------------------------------------------------------------- loss hook

    def loss(self, recs, batch_size, ctx):
        """Assemble the scalar training loss from forward records; fills
        p_tr/p_ev on recs as a side effect. Subclasses implement."""
        raise NotImplementedError

    # Whether the training step applies TALR + alpha_rtr gradient scaling
    # (minimize_expectation vs plain minimize in the reference).
    uses_expectation_optimizer = False
