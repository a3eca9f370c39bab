#!/usr/bin/env python3
"""Microbenchmarks for the packed-sweep design decision (dev tool).

Times fwd+bwd of the candidate conv formulations for running an 8-net
sweep with channels packed into lanes, plus the BN-style reduce in both
layouts. Each case runs inside a lax.scan of K iterations so per-call
dispatch is amortized; sync via host materialization (axon gotcha).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, B, H, W, C = 8, 128, 32, 32, 16
K = 50


def bench(tag, fn, *args):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])  # compile+sync
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / K * 1e6
    print(json.dumps({"case": tag, "us_per_iter": round(dt, 1)}),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()

    key = jax.random.PRNGKey(0)
    xs = jax.random.normal(key, (N, B, H, W, C), jnp.bfloat16)
    xp = jax.random.normal(key, (B, H, W, N * C), jnp.bfloat16)
    wv = jax.random.normal(key, (N, 3, 3, C, C), jnp.bfloat16)
    wg = jax.random.normal(key, (3, 3, C, N * C), jnp.bfloat16)   # grouped
    wd = jax.random.normal(key, (3, 3, N * C, N * C), jnp.bfloat16)

    def conv(x, w, groups=1):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)

    def loop(f):
        def run(x, w):
            def body(c, _):
                y = f(c, w)
                # keep shapes fixed: project back to input shape via sum
                return c + 1e-6 * y.astype(c.dtype), ()
            c, _ = lax.scan(body, x, None, length=K)
            # Scalar output: syncing a 16MB tensor through the tunnel costs
            # ~seconds and swamps the measurement.
            return jnp.sum(c.astype(jnp.float32))
        return run

    # fwd-only chains
    bench("fwd_vmap_conv", loop(lambda x, w: jax.vmap(conv)(x, w)), xs, wv)
    bench("fwd_grouped_conv", loop(lambda x, w: conv(x, w, N)), xp, wg)
    bench("fwd_dense_conv", loop(lambda x, w: conv(x, w)), xp, wd)

    # fwd+bwd (grad wrt weights + input)
    def fb(f):
        def run(x, w):
            def body(c, _):
                def lossf(xx, ww):
                    return jnp.sum(f(xx, ww).astype(jnp.float32) ** 2)
                g = jax.grad(lossf, argnums=(0, 1))(c, w)
                return c + 1e-6 * g[0].astype(c.dtype), ()
            c, _ = lax.scan(body, x, None, length=K)
            return jnp.sum(c.astype(jnp.float32))
        return run

    bench("fb_vmap_conv", fb(lambda x, w: jax.vmap(conv)(x, w)), xs, wv)
    bench("fb_grouped_conv", fb(lambda x, w: conv(x, w, N)), xp, wg)
    bench("fb_dense_conv", fb(lambda x, w: conv(x, w)), xp, wd)

    # BN-style moments + normalize in both layouts
    def bn_v(x, _):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, (1, 2, 3))            # (N, C)
        v = jnp.mean(xf * xf, (1, 2, 3)) - m * m
        s = (1.0 / jnp.sqrt(v + 1e-6))
        return (x - m[:, None, None, None].astype(x.dtype)
                ) * s[:, None, None, None].astype(x.dtype)

    def bn_p(x, _):
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, (0, 1, 2))            # (N*C,)
        v = jnp.mean(xf * xf, (0, 1, 2)) - m * m
        s = (1.0 / jnp.sqrt(v + 1e-6))
        return (x - m.astype(x.dtype)) * s.astype(x.dtype)

    bench("fwd_bn_vmap_layout", loop(bn_v), xs, wv)
    bench("fwd_bn_packed_layout", loop(bn_p), xp, wg)




def pool_variants():
    """fwd+bwd cost of 2x2 pool formulations at sweep scale."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from mpnn_tpu.utils import jaxcache
    jaxcache.enable()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 128, 32, 32, 16), jnp.bfloat16)

    def p6(x):  # current: one 6-D reshape-max
        n, b, h, w, c = x.shape
        return jnp.max(x.reshape(n, b, h // 2, 2, w // 2, 2, c),
                       axis=(3, 5))

    def p1d(x):  # two 1-D maxes
        n, b, h, w, c = x.shape
        x = jnp.max(x.reshape(n, b, h, w // 2, 2, c), axis=4)
        return jnp.max(x.reshape(n, b, h // 2, 2, w // 2, c), axis=3)

    def rw(x):  # reduce_window (select-and-scatter backward)
        return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2, 1),
                                 (1, 1, 2, 2, 1), "SAME")

    def fb(f):
        def run(x):
            def body(c, _):
                g = jax.grad(lambda xx: jnp.sum(
                    f(xx).astype(jnp.float32) ** 2))(c)
                return c + 1e-6 * g.astype(c.dtype), ()
            c, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(c.astype(jnp.float32))
        return run

    bench("fb_pool_reshape6d", fb(p6), x)
    bench("fb_pool_two1d", fb(p1d), x)
    bench("fb_pool_reduce_window", fb(rw), x)


if __name__ == "__main__":
    if "--pool" in sys.argv:
        pool_variants()
    else:
        main()
