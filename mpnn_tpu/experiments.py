"""Architectures, hyperparameters and the experiment registry.

The TPU-native counterpart of the reference's experiment configuration
(scripts/arch_and_hypers.py plus the registries in scripts/train-nets:28-88
and scripts/train-adaptive-nets:29-45). All constants, schedules, component
builders and net constructors carry the reference's values exactly; they are
the experimental spec of the ICML 2017 paper.

Three config tiers, as in the reference (SURVEY.md section 5 "config"):
class-level default hypers (mpnn_tpu.ops.layers / mpnn_tpu.models), this
module's constants + constructors, and the named experiment registries
consumed by the train-nets / train-adaptive-nets CLIs."""

from types import SimpleNamespace as Ns

from .ops.layers import (
    BatchNorm, Chain, CrossEntropyError, LinTrans, MultiscaleBatchNorm,
    MultiscaleConvMax, MultiscaleRect, Rect, Select, Softmax, ToPyramid)
from .models import ActorNet, CriticNet, SRNet

################################################################################
# Network hyperparameters (reference scripts/arch_and_hypers.py:12-27)
################################################################################

conv_supp = 3
router_n_chan = 16

k_cpts = [0.0, 1e-9, 2e-9, 4e-9, 8e-9, 1.6e-8, 3.2e-8, 6.4e-8]
k_l2 = 1e-4
σ_w = 1

# 8-stage channel plan: 4-scale 16-chan blocks narrowing to 1-scale 128-chan.
arch = [
    [16, 16, 16, 16],
    [16, 16, 16, 16],
    [32, 32, 32],
    [32, 32, 32],
    [64, 64],
    [64, 64],
    [128],
    [128]]

################################################################################
# Training hyperparameters (reference scripts/arch_and_hypers.py:33-39)
################################################################################

n_iter = 80000
t_log = 2500
batch_size = 128

λ_lrn = lambda t: 0.1 / 2 ** (t / 10000)
τ_cr = lambda t: 0.1 / 2 ** (t / 20000)
τ_ds = lambda t: 1 / 2 ** (t / 20000)

################################################################################
# Network components (reference scripts/arch_and_hypers.py:45-70)
################################################################################

def router(n_sinks):
    """Routing head: coarsest scale -> 2x [dense16 + BN + ReLU] -> dense
    (zero-init final layer). None for non-switch nodes."""
    if n_sinks < 2:
        return None
    return Chain(name="Router", comps=[
        Select(i=-1),
        LinTrans(n_chan=router_n_chan, k_l2=k_l2, σ_w=σ_w),
        BatchNorm(), Rect(),
        LinTrans(n_chan=router_n_chan, k_l2=k_l2, σ_w=σ_w),
        BatchNorm(), Rect(),
        LinTrans(n_chan=n_sinks, k_l2=k_l2, σ_w=0)])


def pyr(*sinks):
    return Chain(
        name="ToPyramid", sinks=sinks, router=router(len(sinks)),
        comps=[ToPyramid(n_scales=len(arch[0]))])


def rcm(i, *sinks, width=1):
    """Conv stage; `width` scales every channel count (the 'fat'/'fatter'
    variants the reference's width-scaling figures consume,
    scripts/make-acc-eff-plots:218-225)."""
    return Chain(
        name="ReConvMax", sinks=sinks, router=router(len(sinks)),
        comps=[
            MultiscaleConvMax(n_chan=[width * c for c in arch[i]],
                              supp=conv_supp, k_l2=k_l2, σ_w=σ_w),
            MultiscaleBatchNorm(), MultiscaleRect()])


def reg(n_chan):
    """Early-exit logistic-regression leaf."""
    return Chain(name="LogReg", comps=[
        Select(i=-1),
        LinTrans(n_chan=n_chan, k_l2=k_l2, σ_w=σ_w),
        Softmax(), CrossEntropyError()])


################################################################################
# Network constructors (reference scripts/arch_and_hypers.py:76-139)
################################################################################

def sr_chain(n_tf, width=1):
    """Statically-routed chain of the first n_tf conv stages."""
    def make_net(x0_shape, y_shape):
        root = reg(y_shape[0])
        for i in reversed(range(n_tf)):
            root = rcm(i, root, width=width)
        root = pyr(root)
        return SRNet(x0_shape=x0_shape, y_shape=y_shape, root=root)
    return make_net


def dr_chain(type_, width=1, **hypers):
    """Dynamically-routed 8-deep chain; every node also feeds an early-exit
    LogReg leaf."""
    def make_net(x0_shape, y_shape):
        root = rcm(len(arch) - 1, reg(y_shape[0]), width=width)
        for i in reversed(range(len(arch) - 1)):
            root = rcm(i, reg(y_shape[0]), root, width=width)
        root = pyr(root)
        return type_(x0_shape=x0_shape, y_shape=y_shape, root=root, **hypers)
    return make_net


def dr_tree(type_, **hypers):
    """Dynamically-routed branching tree: 2-way fanouts at depths 1-3 with
    shared-shape 5-deep chain tails."""
    def make_net(x0_shape, y_shape):
        def tail():
            node = rcm(len(arch) - 1, reg(y_shape[0]))
            for i in reversed(range(3, len(arch) - 1)):
                node = rcm(i, reg(y_shape[0]), node)
            return node

        def fan(i):
            if i < 3:
                return rcm(i, reg(y_shape[0]), fan(i + 1), fan(i + 1))
            return tail()

        root = pyr(fan(0))
        return type_(x0_shape=x0_shape, y_shape=y_shape, root=root, **hypers)
    return make_net


def ac_chain(**hypers):
    return dr_chain(ActorNet, **hypers)


def ac_tree(**hypers):
    return dr_tree(ActorNet, **hypers)


def cr_chain(**hypers):
    return dr_chain(CriticNet, **hypers)


def cr_tree(**hypers):
    return dr_tree(CriticNet, **hypers)


################################################################################
# Experiment registries
################################################################################

# Per-net-type tau schedule selection (reference scripts/train-nets:24-26).
SR_TAU, AC_TAU, CR_TAU = None, τ_ds, τ_cr


def _sweep_sr(dataset, width=1):
    return Ns(dataset=dataset,
              nets=[sr_chain(n, width=width)
                    for n in range(1, len(arch) + 1)],
              tau=SR_TAU)


def _sweep(dataset, ctor, tau, **hypers):
    """A k_cpt sweep: 8 same-architecture nets differing only in the
    cost-of-compute price (reference scripts/train-nets:31-35). The
    `sweep_k_cpts` marker lets the trainer vmap the whole sweep into one
    program (mpnn_tpu.models.steps.make_sweep_train_loop)."""
    return Ns(dataset=dataset,
              nets=[ctor(k_cpt=k, **hypers) for k in k_cpts],
              tau=tau, sweep_k_cpts=list(k_cpts))


def make_experiments():
    """The train-nets registry (reference scripts/train-nets:28-88), plus
    `mnist-sr` / `cifar10-cr` (BASELINE.json configs) and `synth-*` smoke
    experiments for air-gapped testing."""
    e = {
        "hybrid-sr": _sweep_sr("data/hybrid.npz"),
        "hybrid-ac": _sweep("data/hybrid.npz", ac_chain, AC_TAU),
        "hybrid-ac-nokdec": _sweep("data/hybrid.npz", ac_chain, AC_TAU,
                                   k_dec=0),
        "hybrid-ac-notalr": _sweep("data/hybrid.npz", ac_chain, AC_TAU,
                                   talr=False),
        "hybrid-ac-tree": _sweep("data/hybrid.npz", ac_tree, AC_TAU),
        # "Actor Nets, Regularized Policy": plotted by the reference's
        # figure scripts (make-acc-eff-plots:109, make-pres-figs:128) but
        # never defined in its registry — reconstructed here (see
        # models/actor.py docstring): bare-softmax policy (no eps
        # mixture), entropy regularizer instead of the decisiveness term,
        # plain global momentum (no TALR).
        "hybrid-ac-globopt": _sweep("data/hybrid.npz", ac_chain, AC_TAU,
                                    globopt=True, talr=False),
        "hybrid-cr": _sweep("data/hybrid.npz", cr_chain, CR_TAU),
        "hybrid-cr-opt": _sweep("data/hybrid.npz", cr_chain, CR_TAU,
                                optimistic=True),
        "hybrid-cr-clserr": _sweep("data/hybrid.npz", cr_chain, CR_TAU,
                                   use_cls_err=True),
        "hybrid-cr-notalr": _sweep("data/hybrid.npz", cr_chain, CR_TAU,
                                   talr=False),
        "cifar2-sr": _sweep_sr("data/cifar-2.npz"),
        "cifar2-ac": _sweep("data/cifar-2.npz", ac_chain, AC_TAU),
        "cifar5-sr": _sweep_sr("data/cifar-5.npz"),
        "cifar5-ac": _sweep("data/cifar-5.npz", ac_chain, AC_TAU),
        "cifar10-sr": _sweep_sr("data/cifar-10.npz"),
        "cifar10-ac": _sweep("data/cifar-10.npz", ac_chain, AC_TAU),
        # Width-scaled variants consumed by the reference's width-scaling
        # figures (absent from the reference registry itself; SURVEY.md
        # section 2 #25 notes the plots reference a superset of runs):
        "cifar10-sr-fat": _sweep_sr("data/cifar-10.npz", width=2),
        "cifar10-ac-fat": _sweep("data/cifar-10.npz", ac_chain, AC_TAU,
                                 width=2),
        "cifar10-sr-fatter": _sweep_sr("data/cifar-10.npz", width=4),
        "cifar10-ac-fatter": _sweep("data/cifar-10.npz", ac_chain, AC_TAU,
                                    width=4),
        # Extensions beyond the reference registry (BASELINE.json configs):
        "mnist-sr": _sweep_sr("data/mnist.npz"),
        "cifar10-cr": _sweep("data/cifar-10.npz", cr_chain, CR_TAU),
        # Air-gapped smoke experiments on synthetic data:
        "synth-sr": _sweep_sr("data/synth.npz"),
        "synth-ac": _sweep("data/synth.npz", ac_chain, AC_TAU),
        "synth-ac-globopt": _sweep("data/synth.npz", ac_chain, AC_TAU,
                                   globopt=True, talr=False),
        "synth-cr": _sweep("data/synth.npz", cr_chain, CR_TAU),
        "synth-ac-tree": _sweep("data/synth.npz", ac_tree, AC_TAU),
        "synth-cr-tree": _sweep("data/synth.npz", cr_tree, CR_TAU),
    }
    return e


def make_adaptive_experiments():
    """The train-adaptive-nets registry
    (reference scripts/train-adaptive-nets:29-45): single nets with
    per-example k_cpt sampled from the sweep each batch."""
    return {
        "hybrid-ac-dynkcpt": Ns(
            dataset="data/hybrid.npz", net=ac_chain(dyn_k_cpt=True),
            tau=AC_TAU),
        "hybrid-ac-tree-dynkcpt": Ns(
            dataset="data/hybrid.npz", net=ac_tree(dyn_k_cpt=True),
            tau=AC_TAU),
        "hybrid-cr-dynkcpt": Ns(
            dataset="data/hybrid.npz", net=cr_chain(dyn_k_cpt=True),
            tau=CR_TAU),
        "hybrid-cr-tree-dynkcpt": Ns(
            dataset="data/hybrid.npz", net=cr_tree(dyn_k_cpt=True),
            tau=CR_TAU),
        "synth-ac-dynkcpt": Ns(
            dataset="data/synth.npz", net=ac_chain(dyn_k_cpt=True),
            tau=AC_TAU),
        "synth-ac-tree-dynkcpt": Ns(
            dataset="data/synth.npz", net=ac_tree(dyn_k_cpt=True),
            tau=AC_TAU),
        "synth-cr-dynkcpt": Ns(
            dataset="data/synth.npz", net=cr_chain(dyn_k_cpt=True),
            tau=CR_TAU),
        # CR price-insensitivity probes (VERDICT r4 next #5): the trained
        # adaptive critics are frontier-FLAT while their actor twins span
        # it. Variants isolate the two candidate mechanisms: the price
        # input feature is too small at the deployment price range
        # (α_cpt * max(k_cpts) = 0.64 vs ~1-scale activations), and the
        # cold τ_cr schedule never explores price-conditional routing.
        "synth-cr-dynkcpt-acpt1e9": Ns(
            dataset="data/synth.npz",
            net=cr_chain(dyn_k_cpt=True, α_cpt=1e9), tau=CR_TAU),
        "synth-cr-dynkcpt-tauhot": Ns(
            dataset="data/synth.npz", net=cr_chain(dyn_k_cpt=True),
            tau=AC_TAU),
        # The frontier-spanning CR config the 10k probes point at: with
        # α_cpt=1e9 the price feature's pre-activation swing across the
        # deployment range becomes decisive (~65x the default's), and
        # the 10k probe's routing response went from 3/512 examples to
        # 215/512 with monotone ops (results/cr-probe-*.json).
        "hybrid-cr-dynkcpt-acpt1e9": Ns(
            dataset="data/hybrid.npz",
            net=cr_chain(dyn_k_cpt=True, α_cpt=1e9), tau=CR_TAU),
    }
