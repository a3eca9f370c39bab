"""Device-resident, fully-vectorized data augmentation.

Reimplements the semantics of the reference's host-side, per-image Python
augmentation loop (reference scripts/lib/data.py:10-34) as batched JAX ops so
the whole thing fuses into the jitted train step:

- `rand_shift_batch`: shift each image by (du, dv) ~ U{-r..r} (independent per
  image), filling vacated pixels with that image's per-channel mean
  (reference scripts/lib/data.py:13-22).
- `rand_flip_batch`: horizontal flip with prob 1/2, but only for examples
  whose class is flip-symmetric according to the dataset's `m_sym` mask
  (reference scripts/lib/data.py:10-11,29-32).
- `augmented_batch`: sample-with-replacement a batch of size n and apply both
  (reference scripts/lib/data.py:24-34).

The reference's augmentation RNG is unseeded NumPy; parity here is
distributional, not bitwise (SURVEY.md section 7, "Seeded data prep parity").
"""

import jax
import jax.numpy as jnp


def rand_shift_batch(key, x, r):
    """Shift every image in x (B,H,W,C) by an independent (du,dv) in [-r,r].

    Vacated pixels are filled with the per-image, per-channel mean, matching
    reference scripts/lib/data.py:20 (`b[:] = np.mean(a, (0, 1))`); the
    output is b[i, j] = a[i + du, j + dv] where defined, mean elsewhere
    (the reference's slice bookkeeping, scripts/lib/data.py:15-21).

    TPU note: this is deliberately GATHER-FREE. A vmapped dynamic_slice
    lowers to per-example gathers that measured ~3.6 ms/step on v5e --
    ~85% of the whole b128 train step. Instead the shift is two batched
    one-hot selection matmuls (out = S_u @ x @ S_v^T), which are exact
    (0/1 matrices in fp32) and run on the MXU in microseconds; out-of-range
    rows/cols are zero in the product and get the mean fill via a mask.
    """
    if r == 0:
        return x
    b, h, w, c = x.shape
    duv = jax.random.randint(key, (b, 2), -r, r + 1)
    du, dv = duv[:, 0], duv[:, 1]
    fill = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)

    iu = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)  # out row i
    ku = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)  # src row k
    s_u = (ku == iu + du[:, None, None]).astype(x.dtype)  # (B,h,h)
    iv = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    kv = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    s_v = (kv == iv + dv[:, None, None]).astype(x.dtype)  # (B,w,w)

    t = jnp.einsum("bik,bkwc->biwc", s_u, x)
    out = jnp.einsum("bjl,bilc->bijc", s_v, t)

    row_ok = jnp.sum(s_u, axis=2)  # (B,h): 1 iff source row in range
    col_ok = jnp.sum(s_v, axis=2)  # (B,w)
    cover = row_ok[:, :, None] * col_ok[:, None, :]
    return out + fill * (1.0 - cover[..., None])


def rand_flip_batch(key, x, flip_allowed):
    """Horizontally flip each image with prob 1/2, gated by `flip_allowed` (B,).

    The reference flips along the width axis (`a[:, ::-1]`,
    scripts/lib/data.py:10-11) and only when the example's class is marked
    symmetric (`m_sym[argmax(y)]`, scripts/lib/data.py:29-32).
    """
    coin = jax.random.bernoulli(key, 0.5, (x.shape[0],))
    do_flip = jnp.logical_and(coin, flip_allowed.astype(bool))
    return jnp.where(do_flip[:, None, None, None], x[:, :, ::-1, :], x)


def augment_presampled(key, xb, yb, m_sym, r_shift=4):
    """Flip + shift an already-sampled batch (gather done by the caller).

    Same math as the augmentation half of `augmented_batch`; used by the
    scan-chained train loop, which pre-gathers a whole chunk's batches in
    one large HBM gather (small per-step gathers are latency-bound on TPU:
    a 128-row gather measured 175us, ~11x over HBM-bandwidth time).
    """
    k_flip, k_shift = jax.random.split(key)
    # One-hot labels: m_sym[argmax(y)] == y @ m_sym, gather-free.
    flip_allowed = jnp.dot(yb, m_sym.astype(yb.dtype))
    xb = rand_flip_batch(k_flip, xb, flip_allowed)
    xb = rand_shift_batch(k_shift, xb, r_shift)
    return xb, yb


def augmented_batch(key, x0, y, m_sym, n, r_shift=4):
    """Sample an augmented training batch of size n.

    Equivalent to `Dataset.augmented_training_batch`
    (reference scripts/lib/data.py:24-34, 75-76): uniform
    sample-with-replacement, class-gated flip, then mean-filled random shift.
    All arrays stay on device; runs inside jit.
    """
    k_idx, k_aug = jax.random.split(key)
    idx = jax.random.randint(k_idx, (n,), 0, x0.shape[0])
    xb = jnp.take(x0, idx, axis=0)
    yb = jnp.take(y, idx, axis=0)
    return augment_presampled(k_aug, xb, yb, m_sym, r_shift)


def sampled_batch(key, x0, y, n):
    """Un-augmented uniform batch (reference scripts/lib/data.py:36-40)."""
    idx = jax.random.randint(key, (n,), 0, x0.shape[0])
    return jnp.take(x0, idx, axis=0), jnp.take(y, idx, axis=0)
