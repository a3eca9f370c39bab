#!/usr/bin/env python3
"""BN-moment formulation microbench (dev tool).

The sweep-step profile attributes ~29% of step time to BN-moment reduces
(CLAUDE.md). BatchNorm computes mean(x) and mean(x^2) as two jnp reduces;
XLA may or may not fuse them into one pass over x. Candidates, each
fwd+bwd at the sweep layout (N=8 nets, B=128, HxW=32x32, C=16 bf16, the
hot stage-0 shape), inside a lax.scan of K iters to amortize dispatch:

  two_means   -- m = mean(x); v = mean(x^2) - m^2   (current BatchNorm)
  variadic    -- ONE lax.reduce with operands (x, x*x): a guaranteed
                 single pass over x
  dot_ones    -- moments as matmuls against a ones vector: (B*H*W, C)^T
                 contraction on the MXU, one x read for both via concat

Each candidate completes a full BN train-mode normalize (affine fold, as
ops.layers.BatchNorm does in bf16) so the timing covers what the step
would actually run, and grads flow to gamma/beta + x.

Sync via host materialization (axon gotcha)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, B, H, W, C = 8, 128, 32, 32, 16
K = 50
EPS = 1e-6


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, B, H, W, C), jnp.bfloat16)
    gamma = jnp.ones((N, C), jnp.float32)
    beta = jnp.zeros((N, C), jnp.float32)

    def normalize(x, m, v, g, b):
        scale = g / jnp.sqrt(v + EPS)
        shift = b - scale * m
        return x * scale.astype(x.dtype)[:, None, None, None, :] \
            + shift.astype(x.dtype)[:, None, None, None, :]

    def moments_two_means(x):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, (1, 2, 3))
        v = jnp.mean(jnp.square(xf), (1, 2, 3)) - jnp.square(m)
        return m, v

    def moments_variadic(x):
        xf = x.astype(jnp.float32)
        n = B * H * W
        s, ss = lax.reduce((xf, xf * xf), (jnp.float32(0), jnp.float32(0)),
                           lambda a, c: (a[0] + c[0], a[1] + c[1]),
                           (1, 2, 3))
        m = s / n
        return m, ss / n - jnp.square(m)

    def moments_dot_ones(x):
        xf = x.astype(jnp.float32).reshape(N, B * H * W, C)
        ones = jnp.ones((B * H * W,), jnp.float32)
        n = B * H * W
        s = jnp.einsum("nbc,b->nc", xf, ones)
        ss = jnp.einsum("nbc,nbc->nc", xf, xf)
        m = s / n
        return m, ss / n - jnp.square(m)

    def make_case(moments):
        def loss(x, g, b):
            m, v = moments(x)
            out = normalize(x, m, v, g, b)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        grad = jax.grad(loss, argnums=(0, 1, 2))

        def scan_body(carry, _):
            x, g, b = carry
            dx, dg, db = grad(x, g, b)
            return (x + 0 * dx, g + 0 * dg, b + 0 * db), ()

        def run(x, g, b):
            (x, g, b), _ = lax.scan(scan_body, (x, g, b), None, length=K)
            return x

        return jax.jit(run)

    for tag, moments in [("two_means", moments_two_means),
                         ("variadic_reduce", moments_variadic),
                         ("dot_ones", moments_dot_ones)]:
        f = make_case(moments)
        out = f(x, gamma, beta)
        np.asarray(out)  # compile + sync
        t0 = time.perf_counter()
        out = f(x, gamma, beta)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / K * 1e6
        print(json.dumps({"case": tag, "us_per_iter": round(dt, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
