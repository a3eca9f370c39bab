"""mpnn_tpu.paritycheck: the user-facing checkpoint-vs-oracle harness.

Positive controls (fp32 forwards of actor/critic/SR/dyn_k_cpt nets pass),
a negative control (bf16 compute must FAIL the fp32-grade tolerances --
the harness detects precision divergence, it is not insensitive), and the
tau-aware routing tolerance (a sharp-temperature critic passes through
the 1/tau error amplification without loosening the tau=1 case)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpnn_tpu.models import ActorNet, CriticNet, SRNet
from mpnn_tpu.ops import config
from mpnn_tpu.ops.layers import (Chain, LinTrans, Softmax,
                                 CrossEntropyError)
from mpnn_tpu.paritycheck import check_parity, _effective_tols

from .test_reference_oracle import (_two_switch_tree, _body, _data,
                                    B, H, W, C, NCLS)


def _jitter(params, seed):
    r = np.random.RandomState(seed)
    return jax.tree.map(
        lambda a: a + jnp.asarray(0.05 * r.randn(*np.shape(a)), a.dtype),
        params)


@pytest.mark.parametrize("cls,kw", [
    (ActorNet, dict(k_cpt=3e-9, k_dec=0.02)),
    (CriticNet, dict(k_cpt=3e-9, k_cre=1e-2)),
    (ActorNet, dict(k_cpt=0.0, dyn_k_cpt=True, α_cpt=1e7)),
])
def test_check_parity_passes_fp32(cls, kw):
    net = _two_switch_tree(cls, τ=0.7, ϵ=0.05, **kw)
    params, state = net.init(jax.random.PRNGKey(0))
    x0, y = _data(0)
    report = check_parity(net, _jitter(params, 1), state, x0, y)
    assert report["ok"], report
    assert report["checks"]["p_tr"]["n"] > 0


def test_check_parity_sr_and_eval_mode():
    body = Chain(comps=_body() + [LinTrans(n_chan=NCLS, k_l2=1e-4),
                                  Softmax(), CrossEntropyError()])
    net = SRNet(root=body, x0_shape=(H, W, C), y_shape=(NCLS,))
    params, state = net.init(jax.random.PRNGKey(1))
    x0, y = _data(1)
    for train in (True, False):
        report = check_parity(net, params, state, x0, y, train=train)
        assert report["ok"], (train, report)
        assert "p_tr" not in report["checks"]
        assert report["checks"]["x_root"]["n"] == 1


def test_check_parity_detects_bf16_divergence():
    """Negative control: under a bf16 compute dtype the fp32-grade
    tolerances must FAIL -- the harness is sensitive, not a rubber
    stamp."""
    net = _two_switch_tree(ActorNet, k_cpt=3e-9, τ=0.7, ϵ=0.05)
    params, state = net.init(jax.random.PRNGKey(2))
    params = _jitter(params, 3)
    x0, y = _data(2)
    config.set_compute_dtype(jnp.bfloat16)
    try:
        report = check_parity(net, params, state, x0, y)
    finally:
        config.set_compute_dtype(None)
    assert not report["ok"], report


def test_tau_aware_routing_tolerance():
    """Sharp temperatures widen ONLY the routing rtol, proportionally to
    n_switches/tau; tau=1 keeps the base."""
    net = _two_switch_tree(ActorNet, k_cpt=3e-9, τ=1.0, ϵ=0.05)
    base = _effective_tols(net, tau=1.0)
    sharp = _effective_tols(net, tau=0.01)
    assert base["p_tr"]["rtol"] == pytest.approx(2e-4)
    assert sharp["p_tr"]["rtol"] == pytest.approx(
        2 * 2e-5 / 0.01)  # 2 switches * atol_logit / tau
    assert sharp["c_err"] == base["c_err"]

    # And a sharp-temperature forward passes end to end.
    params, state = net.init(jax.random.PRNGKey(4))
    x0, y = _data(4)
    report = check_parity(net, _jitter(params, 5), state, x0, y, tau=0.01)
    assert report["ok"], report


@pytest.mark.parametrize("cls,kw", [
    (ActorNet, dict(k_cpt=3e-9, k_dec=0.02)),
    (CriticNet, dict(k_cpt=3e-9, k_cre=1e-2)),
    (ActorNet, dict(k_cpt=1e-9, dyn_k_cpt=True, α_cpt=1e7)),
])
def test_check_grad_parity(cls, kw):
    """The user-facing gradient harness agrees with the repo gradient via
    the oracle FD (sg-placement sensitivity itself is pinned by
    test_grad_oracle's naive-vs-sg control)."""
    from mpnn_tpu.paritycheck import check_grad_parity
    net = _two_switch_tree(cls, τ=0.7, ϵ=0.05, **kw)
    params, state = net.init(jax.random.PRNGKey(6))
    x0, y = _data(6)
    report = check_grad_parity(net, _jitter(params, 7), state, x0, y)
    assert report["ok"], report
