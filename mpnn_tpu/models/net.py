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

from ..ops.layers import NoOp


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
        self.hypers = Ns(**{**dict(type(self).default_hypers), **hypers})
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

    def forward(self, params, state, x0, y, ctx):
        """Run the whole tree densely; returns ({node: Rec}, new_state).

        Under a bf16 compute policy the input casts to bf16 HERE and
        activations stay bf16 through the whole tree (the train step is
        HBM-bandwidth-bound; see ops.layers.conv_same). Router logits are
        recorded in fp32: every consumer (routing eps-mixture -- whose
        floors sit at ~1e-7, SURVEY.md section 7 "hard parts" --, critic
        regression, c_dec, x_rte stats) is precision-sensitive and tiny."""
        from ..ops import config
        if config.compute_dtype is not None:
            x0 = x0.astype(config.compute_dtype)
        recs = {}

        def fwd(node, p, s, x):
            x_out, ns_layer, aux = node.apply(p["layer"], s["layer"], x, y,
                                              ctx)
            rec = Rec()
            rec.x = x_out
            rec.c_err, rec.c_mod = aux.c_err, aux.c_mod
            rec.delta_cor = aux.delta_cor
            ns = {"layer": ns_layer, "router": s["router"], "sinks": []}
            if node.router is not None:
                x_rte = self._router_input(x_out, ctx)
                r_x, ns_rtr, r_aux = node.router.apply(
                    p["router"], s["router"], x_rte, y, ctx)
                rec.router_x = r_x.astype(jnp.float32)
                rec.router_c_mod = r_aux.c_mod
                ns["router"] = ns_rtr
            recs[node] = rec
            for i, snk in enumerate(node.sinks):
                ns["sinks"].append(
                    fwd(snk, p["sinks"][i], s["sinks"][i], x_out))
            return ns

        new_state = fwd(self.root, params, state, x0)
        return recs, new_state

    # ------------------------------------------------------------- loss hook

    def loss(self, recs, batch_size, ctx):
        """Assemble the scalar training loss from forward records; fills
        p_tr/p_ev on recs as a side effect. Subclasses implement."""
        raise NotImplementedError

    # Whether the training step applies TALR + alpha_rtr gradient scaling
    # (minimize_expectation vs plain minimize in the reference).
    uses_expectation_optimizer = False
