"""Checkpoint-vs-oracle parity harness (the user-facing surface of
SURVEY.md section 7 M6's "routing-stat parity harness").

Runs a net's fp32 JAX forward + loss and the independent NumPy float64
oracle (mpnn_tpu.oracle — re-derived directly from the reference sources,
sharing nothing with the JAX path but the parameter arrays) on the same
batch, and reports per-quantity deviations: routing probabilities p_tr /
p_ev, router logits, per-leaf error costs, the root output, and the total
training loss. `scripts/check-parity` wraps this for any on-disk
checkpoint.

ToPyramid is the one documented-deviant operator (resize grid, PARITY.md):
its output is substituted into the oracle so everything downstream is
still pinned independently.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import oracle
from .models.net import Ctx
from .models.steps import _hyper

# Default tolerances: fp32 forward vs float64 oracle across the registry
# architectures (deep chains put p_tr across ~7 orders of magnitude; see
# tests/test_reference_oracle.py flagship tests, which use the same).
TOLS = {
    "p_tr": dict(rtol=2e-4, atol=1e-10),
    "p_ev": dict(rtol=2e-4, atol=1e-10),
    "router_x": dict(rtol=2e-4, atol=2e-5),
    "c_err": dict(rtol=2e-4, atol=1e-6),
    "x_root": dict(rtol=2e-4, atol=2e-5),
    "loss": dict(rtol=5e-4, atol=0.0),
}


def pyramid_override(net, x0):
    """{id(ToPyramid): repo output} when the net starts with a pyramid."""
    from .ops.layers import ToPyramid
    comps = getattr(net.root, "comps", None) or []
    if not comps or not isinstance(comps[0], ToPyramid):
        return None
    tp = comps[0]
    out, _, _ = tp.apply({}, {}, jnp.asarray(x0), None,
                         Ctx(train=False, rng=None))
    return {id(tp): [np.float64(np.asarray(o)) for o in out]}


def _dev(a, b, tol):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    abs_err = np.abs(a - b)
    max_abs = float(abs_err.max()) if abs_err.size else 0.0
    over = abs_err - (tol["atol"] + tol["rtol"] * np.abs(b))
    return {"max_abs": max_abs, "ok": bool((over <= 0).all())}


def _merge(report, key, a, b, tols=TOLS):
    d = _dev(a, b, tols[key])
    slot = report["checks"].setdefault(
        key, {"max_abs": 0.0, "ok": True, "n": 0})
    slot["max_abs"] = max(slot["max_abs"], d["max_abs"])
    slot["ok"] = slot["ok"] and d["ok"]
    slot["n"] += 1


def _effective_tols(net, tau):
    """Routing tolerances scale with the temperature: pi_tr's LOG error is
    the logit error amplified by 1/tau (softmax(rx/tau)), compounding
    multiplicatively over the switches on a path -- a trained critic at
    tau_cr(80k) = 0.01 amplifies the fp32 conv stack's ~2e-5 logit noise
    400x per switch, which no fixed fp32-ish rtol survives (SURVEY.md
    'hard parts': parity near the floors in fp32). rtol_p = max(base,
    n_switches * atol_logit / tau); everything else keeps the base."""
    tols = {k: dict(v) for k, v in TOLS.items()}
    amp = len(list(net.switches)) * TOLS["router_x"]["atol"] / max(tau,
                                                                   1e-12)
    for k in ("p_tr", "p_ev"):
        tols[k]["rtol"] = max(tols[k]["rtol"], amp)
    return tols


def check_parity(net, params, state, x0, y, *, train=True, tau=None,
                 eps=None, k_cpt=None):
    """Compare the JAX forward/loss against the float64 oracle.

    x0/y: a host batch (B, ...) / (B, n_cls). tau/eps/k_cpt default to the
    net's hypers (k_cpt may be a per-example array for dyn_k_cpt nets).
    Returns a JSON-able report dict with per-quantity max deviations and
    an overall "ok"."""
    tau = float(_hyper(net, "τ", 1.0)) if tau is None else float(tau)
    eps = float(_hyper(net, "ϵ", 1e-6)) if eps is None else float(eps)
    dyn = bool(_hyper(net, "dyn_k_cpt", False))
    if k_cpt is None:
        k_cpt = _hyper(net, "k_cpt", 0.0)
        if dyn:
            k_cpt = np.full((len(x0),), float(k_cpt), np.float32)
    x0 = np.asarray(x0, np.float32)
    y = np.asarray(y, np.float32)

    ctx = Ctx(train=train, rng=None, tau=tau, eps=eps,
              k_cpt=(jnp.asarray(k_cpt) if dyn else k_cpt))
    jp = jax.tree.map(jnp.asarray, params)
    js = jax.tree.map(jnp.asarray, state)
    recs, _ = net.forward(jp, js, jnp.asarray(x0), jnp.asarray(y), ctx)
    loss = float(net.loss(recs, len(x0), ctx))

    np64 = lambda t: jax.tree.map(lambda a: np.asarray(a, np.float64), t)
    infos = oracle.net_forward(
        net, np64(params), np64(state), np.float64(x0), np.float64(y),
        train,
        k_cpt=(np.float64(k_cpt) if dyn else None),
        alpha_cpt=(float(_hyper(net, "α_cpt", 1e7)) if dyn else None),
        dyn_k_cpt=dyn, overrides=pyramid_override(net, x0))
    routed = net.uses_expectation_optimizer
    globopt = bool(_hyper(net, "globopt", False))
    if routed:
        oracle.route(net.root, infos, eps=eps, tau=tau, mixture=not globopt)
        kind = type(net).__name__
        if kind == "ActorNet":
            o_loss, _ = oracle.actor_loss(
                net, infos, k_cpt=np.float64(k_cpt),
                k_dec=float(_hyper(net, "k_dec", 0.01)),
                globopt=globopt,
                k_pol=float(_hyper(net, "k_pol", 0.01)))
        else:
            o_loss, _ = oracle.critic_loss(
                net, infos, k_cpt=np.float64(k_cpt),
                k_cre=float(_hyper(net, "k_cre", 1e-3)),
                use_cls_err=bool(_hyper(net, "use_cls_err", False)),
                optimistic=bool(_hyper(net, "optimistic", False)))
    else:
        o_loss = oracle.sr_loss(net, infos)

    tols = _effective_tols(net, tau)
    report = {"net": type(net).__name__, "train": train, "tau": tau,
              "eps": eps, "batch": int(len(x0)), "loss": loss,
              "oracle_loss": float(o_loss),
              "p_rtol": tols["p_tr"]["rtol"], "checks": {}}
    for l in net.layers:
        if routed:
            _merge(report, "p_tr", recs[l].p_tr, infos[l].p_tr, tols)
            _merge(report, "p_ev", recs[l].p_ev, infos[l].p_ev, tols)
        if recs[l].router_x is not None:
            _merge(report, "router_x", recs[l].router_x, infos[l].router_x)
    for l in net.leaves:
        if recs[l].c_err is not None:
            _merge(report, "c_err", recs[l].c_err, infos[l].c_err)
    root_x = recs[net.root].x
    if not isinstance(root_x, (list, tuple)):
        _merge(report, "x_root", root_x, infos[net.root].x)
    _merge(report, "loss", loss, o_loss)
    report["ok"] = all(c["ok"] for c in report["checks"].values())
    return report


def check_grad_parity(net, params, state, x0, y, *, tau=None, eps=None,
                      k_cpt=None, seed=0, fd_eps=1e-6, rtol=2e-3):
    """Directional TRAINING-gradient parity against the oracle.

    Compares <jax.grad L(theta), d> for a random direction d against a
    float64 central finite difference of the oracle's sg-EXPLICIT loss
    (quantities the reference wraps in stop_gradient are held at the
    unperturbed params), so a misplaced sg boundary -- gradient leaking
    into critic targets, c_mod weights, or the decisiveness term -- fails
    the check even when all VALUES agree. Train-mode only."""
    tau = float(_hyper(net, "τ", 1.0)) if tau is None else float(tau)
    eps = float(_hyper(net, "ϵ", 1e-6)) if eps is None else float(eps)
    dyn = bool(_hyper(net, "dyn_k_cpt", False))
    if k_cpt is None:
        k_cpt = _hyper(net, "k_cpt", 0.0)
        if dyn:
            k_cpt = np.full((len(x0),), float(k_cpt), np.float32)
    x0 = np.asarray(x0, np.float32)
    y = np.asarray(y, np.float32)
    kind = type(net).__name__

    ctx = Ctx(train=True, rng=None, tau=tau, eps=eps,
              k_cpt=(jnp.asarray(k_cpt) if dyn else k_cpt))
    js = jax.tree.map(jnp.asarray, state)

    def loss_fn(p):
        recs, _ = net.forward(p, js, jnp.asarray(x0), jnp.asarray(y), ctx)
        return net.loss(recs, len(x0), ctx)

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, params))
    r = np.random.RandomState(seed)
    d = jax.tree.map(lambda a: np.float64(r.randn(*np.shape(a))), params)
    repo_dot = sum(
        float(np.sum(np.asarray(g, np.float64) * dd))
        for g, dd in zip(jax.tree.leaves(grads), jax.tree.leaves(d)))

    np64 = lambda t: jax.tree.map(lambda a: np.asarray(a, np.float64), t)
    params_np, state_np = np64(params), np64(state)
    okw = dict(k_cpt=(np.float64(k_cpt) if dyn else None),
               alpha_cpt=(float(_hyper(net, "α_cpt", 1e7)) if dyn else None),
               dyn_k_cpt=dyn, overrides=pyramid_override(net, x0))

    globopt = bool(_hyper(net, "globopt", False))

    def infos_at(p):
        infos = oracle.net_forward(net, p, state_np, np.float64(x0),
                                   np.float64(y), True, **okw)
        if net.uses_expectation_optimizer:
            oracle.route(net.root, infos, eps=eps, tau=tau,
                         mixture=not globopt)
        return infos

    def perturbed(sign):
        return jax.tree.map(lambda a, b: a + sign * fd_eps * b,
                            params_np, d)

    frozen = infos_at(params_np)
    kc = np.float64(k_cpt)
    if kind == "ActorNet":
        k_dec = float(_hyper(net, "k_dec", 0.01))
        k_pol = float(_hyper(net, "k_pol", 0.01))
        loss_sg = lambda live: oracle.actor_loss_sg(
            net, live, frozen, kc, k_dec, globopt=globopt, k_pol=k_pol)
    elif kind == "CriticNet":
        loss_sg = lambda live: oracle.critic_loss_sg(
            net, live, frozen, kc,
            float(_hyper(net, "k_cre", 1e-3)),
            bool(_hyper(net, "use_cls_err", False)),
            bool(_hyper(net, "optimistic", False)))
    else:
        loss_sg = lambda live: oracle.sr_loss(net, live)
    fd = (loss_sg(infos_at(perturbed(+1)))
          - loss_sg(infos_at(perturbed(-1)))) / (2 * fd_eps)

    ok = bool(np.isclose(repo_dot, fd, rtol=rtol, atol=1e-7))
    return {"net": kind, "loss": float(loss), "repo_grad_dot": repo_dot,
            "oracle_fd": float(fd), "rtol": rtol, "ok": ok}
