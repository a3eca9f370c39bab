"""Byte-faithful synthetic TF1 reference checkpoint generator.

Emits checkpoint records with EXACTLY the schema the reference's
`encode_net` would write for a registry net (reference
scripts/lib/serdes.py:13-19, 40-44) — the same nested-dict key insertion
order, the same hyper-key sets/orders (class defaults merged with
constructor options, reference scripts/lib/layer_types.py:14-20 /
net_types.py:46-49), the same parameter names, dtypes (float32) and TF
layouts (conv kernels HWIO, LinTrans (n_in, n_chan)), the same
MultiscaleBatchNorm link-time `comps` of per-scale BatchNorms
(layer_types.py:241-249) — WITHOUT running TF. Parameter values follow
the reference's init distributions (w_eq + σ_w/√n·N(0,1), zero biases,
BatchNorm γ=1/β=0/m_avg=0/v_avg=1), so the record is what a freshly
initialized reference net would checkpoint; the import test then proves
`read_net` + check-parity on a file the TF code could have produced
(VERDICT r3 next #6; tests/test_reference_import.py).

Unicode nuance worth recording: the reference source spells epsilon as
U+03F5 'ϵ', but Python 3 NFKC-normalizes identifiers at parse time, so
`vars(layer.hypers)` in the actually-running reference yields U+03B5
'ε' keys — THAT is the byte-faithful form this generator emits. The raw
U+03F5 variant (possible for a record that round-tripped through a
string-keyed dict) stays covered by the adversarial denormalized test
in test_reference_import.py.

This module intentionally reproduces the reference's serialization
CONTRACT (names, orders, shapes); the emulation itself is an original
table-driven shape-propagation pass, not a translation of the TF graph
code.
"""

import numpy as np

# Class-default hyper tables, in class-definition order (the insertion
# order of {**vars(default_hypers), **options}; layer_types.py lines
# cited per class). Values are the reference defaults.
LAYER_DEFAULTS = {
    "Chain": {},                                        # :299
    "ToPyramid": {"n_scales": 1},                       # :118-119
    "MultiscaleConvMax": {"n_chan": [], "supp": 1,      # :149-150
                          "k_l2": 0, "σ_w": 1},
    "MultiscaleBatchNorm": {"d": 0.9, "ε": 1e-6},       # :241-242
    "MultiscaleRect": {},                               # :196
    "Select": {"i": 0},                                 # :201-202
    "LinTrans": {"n_chan": 1, "k_l2": 0, "σ_w": 1,      # :39-40
                 "res": False},
    "BatchNorm": {"d": 0.9, "ε": 1e-6},                 # :219-220
    "Rect": {},                                         # :76
    "Softmax": {},                                      # :81
    "CrossEntropyError": {},                            # :262
    "Dropout": {"λ": 1},                                # :212-213
}

NET_DEFAULTS = {
    "SRNet": {"λ_lrn": 1e-3, "μ_lrn": 0.9},             # net_types.py:86
    "ActorNet": {"k_cpt": 0.0, "k_dec": 0.01, "ε": 1e-6, "τ": 1.0,
                 "λ_lrn": 1e-3, "μ_lrn": 0.9, "dyn_k_cpt": False,
                 "α_cpt": 1e7, "talr": True, "α_rtr": 1.0},  # :104-106
    "CriticNet": {"k_cpt": 0.0, "k_cre": 1e-3, "ε": 1e-6, "τ": 0.01,
                  "optimistic": False, "dyn_k_cpt": False, "α_cpt": 1e7,
                  "use_cls_err": False, "λ_lrn": 1e-3, "μ_lrn": 0.9,
                  "talr": True, "α_rtr": 1.0},          # :188-191
}

# The reference's architecture constants (arch_and_hypers.py:12-27).
CONV_SUPP = 3
ROUTER_N_CHAN = 16
K_L2 = 1e-4
SIGMA_W = 1
ARCH = [[16, 16, 16, 16], [16, 16, 16, 16], [32, 32, 32], [32, 32, 32],
        [64, 64], [64, 64], [128], [128]]


class _Spec:
    """One layer node of the construction graph: type/name/options plus
    the record fields filled in by _link (params, link-time comps)."""

    def __init__(self, type_, name=None, router=None, sinks=(), comps=(),
                 **options):
        self.type = type_
        self.name = name if name is not None else type_
        self.router = router
        self.sinks = list(sinks)
        self.comps = list(comps)
        self.hypers = {**LAYER_DEFAULTS[type_], **options}
        self.params = {}


def _f32(a):
    return np.asarray(a, np.float32)


def _link(node, x, rng):
    """Reference link() emulation: propagate the shape descriptor
    (tuple (h, w, c), int n_flat, or list-of-tuples for multiscale) and
    create params with the reference's names/shapes/init values."""
    t, h = node.type, node.hypers
    if t == "Chain":
        for comp in node.comps:
            x = _link(comp, x, rng)
        return x
    if t == "ToPyramid":
        hh, ww, c = x
        return [(hh // 2 ** i, ww // 2 ** i, c)
                for i in range(h["n_scales"])]
    if t == "MultiscaleConvMax":
        n_chan, supp = h["n_chan"], h["supp"]
        k = len(n_chan)
        for j, i in enumerate(range(-k, 0)):
            hi, wi, ci = x[i]
            node.params["w_horz_%i" % j] = _f32(
                h["σ_w"] / supp / np.sqrt(ci)
                * rng.standard_normal((min(supp, hi), min(supp, wi),
                                       ci, n_chan[j])))
        for i in range(k - 1):
            node.params["w_vert_%i" % i] = _f32(
                h["σ_w"] / supp / np.sqrt(n_chan[i])
                * rng.standard_normal((supp, supp, n_chan[i],
                                       n_chan[i + 1])))
        for i in range(k):
            node.params["b_%i" % i] = _f32(np.zeros(n_chan[i]))
        return [(x[-k + j][0], x[-k + j][1], n_chan[j]) for j in range(k)]
    if t == "MultiscaleBatchNorm":
        # link-time comps: one BatchNorm per scale (layer_types.py:245)
        node.comps = [_Spec("BatchNorm") for _ in x]
        for comp, x_i in zip(node.comps, x):
            _link(comp, x_i, rng)
        return x
    if t == "MultiscaleRect":
        return x
    if t == "Select":
        return x[h["i"]]
    if t == "LinTrans":
        n_in = int(np.prod(x))
        n_chan = h["n_chan"]
        w_eq = np.eye(n_in, n_chan) if h["res"] else 0
        node.params["w"] = _f32(
            w_eq + h["σ_w"] / np.sqrt(n_in)
            * rng.standard_normal((n_in, n_chan)))
        node.params["b"] = _f32(np.zeros(n_chan))
        return (n_chan,)
    if t == "BatchNorm":
        n_chan = x[-1] if isinstance(x, tuple) else int(x)
        node.params["γ"] = _f32(np.ones(n_chan))
        node.params["β"] = _f32(np.zeros(n_chan))
        node.params["m_avg"] = _f32(np.zeros(n_chan))
        node.params["v_avg"] = _f32(np.ones(n_chan))
        return x
    if t in ("Rect", "Softmax", "CrossEntropyError", "Dropout"):
        return x
    raise ValueError("generator does not model layer type %r" % t)


def _link_net(root, x, rng):
    """The net-level walk (net_types.py:146-164 link_layer): link the
    node, then its router on the node's OUTPUT, then each sink on that
    same output."""
    out = _link(root, x, rng)
    if root.router is not None:
        _link(root.router, out, rng)
    for sink in root.sinks:
        _link_net(sink, out, rng)


def _encode_layer(node):
    """Exactly reference serdes.py:13-19 (key insertion order included)."""
    return None if node is None else dict(
        type=node.type, name=node.name, hypers=dict(node.hypers),
        params=dict(node.params),
        sinks=list(map(_encode_layer, node.sinks)),
        comps=list(map(_encode_layer, node.comps)),
        router=_encode_layer(node.router))


# -- the reference's component constructors (arch_and_hypers.py:44-70) --

def _router(n_sinks):
    if n_sinks < 2:
        return None
    return _Spec("Chain", name="Router", comps=[
        _Spec("Select", i=-1),
        _Spec("LinTrans", n_chan=ROUTER_N_CHAN, k_l2=K_L2, σ_w=SIGMA_W),
        _Spec("BatchNorm"), _Spec("Rect"),
        _Spec("LinTrans", n_chan=ROUTER_N_CHAN, k_l2=K_L2, σ_w=SIGMA_W),
        _Spec("BatchNorm"), _Spec("Rect"),
        _Spec("LinTrans", n_chan=n_sinks, k_l2=K_L2, σ_w=0)])


def _pyr(*sinks):
    return _Spec("Chain", name="ToPyramid", sinks=sinks,
                 router=_router(len(sinks)),
                 comps=[_Spec("ToPyramid", n_scales=len(ARCH[0]))])


def _rcm(i, *sinks):
    return _Spec("Chain", name="ReConvMax", sinks=sinks,
                 router=_router(len(sinks)),
                 comps=[_Spec("MultiscaleConvMax", n_chan=ARCH[i],
                              supp=CONV_SUPP, k_l2=K_L2, σ_w=SIGMA_W),
                        _Spec("MultiscaleBatchNorm"),
                        _Spec("MultiscaleRect")])


def _reg(n_chan):
    return _Spec("Chain", name="LogReg", comps=[
        _Spec("Select", i=-1),
        _Spec("LinTrans", n_chan=n_chan, k_l2=K_L2, σ_w=SIGMA_W),
        _Spec("Softmax"), _Spec("CrossEntropyError")])


def generate_record(net_type="ActorNet", x0_shape=(32, 32, 3),
                    y_shape=(10,), seed=0, sr_n_tf=8, **net_hypers):
    """The full record the reference's encode_net would produce for a
    registry chain net: SRNet via sr_chain(sr_n_tf), ActorNet/CriticNet
    via dr_chain (arch_and_hypers.py:76-101)."""
    rng = np.random.default_rng(seed)
    if net_type == "SRNet":
        root = _reg(y_shape[0])
        for i in reversed(range(sr_n_tf)):
            root = _rcm(i, root)
        root = _pyr(root)
    else:
        root = _rcm(-1, _reg(y_shape[0]))
        for i in reversed(range(len(ARCH) - 1)):
            root = _rcm(i, _reg(y_shape[0]), root)
        root = _pyr(root)
    _link_net(root, tuple(x0_shape), rng)
    # Net record (serdes.py:40-44): hypers = {**class defaults,
    # **options}; options carry x0_shape/y_shape (+ overrides), appended
    # after the defaults in construction order. Net-level params: the
    # reference's net.params Ns() is never populated -> {}.
    hypers = {**NET_DEFAULTS[net_type], **net_hypers,
              "x0_shape": tuple(x0_shape), "y_shape": tuple(y_shape)}
    return dict(type=net_type, root=_encode_layer(root), hypers=hypers,
                params={})


def write_reference_checkpoint(path, **kw):
    """reference serdes.py:56-57: np.save of the raw record."""
    np.save(path, generate_record(**kw))
    return path
