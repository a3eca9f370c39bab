"""Augmentation semantics vs. an independent NumPy oracle
(reference scripts/lib/data.py:10-34)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpnn_tpu.data.augment import (rand_shift_batch, rand_flip_batch,
                                   augmented_batch)


def np_shift_oracle(a, du, dv):
    """Straight NumPy port of the reference's slice bookkeeping
    (scripts/lib/data.py:13-22) used only as a test oracle."""
    b = np.empty_like(a)
    i_u_a = slice(max(du, 0), min(a.shape[0] + du, a.shape[0]))
    i_v_a = slice(max(dv, 0), min(a.shape[1] + dv, a.shape[1]))
    i_u_b = slice(max(-du, 0), min(a.shape[0] - du, a.shape[0]))
    i_v_b = slice(max(-dv, 0), min(a.shape[1] - dv, a.shape[1]))
    b[:] = np.mean(a, (0, 1))
    b[i_u_b, i_v_b] = a[i_u_a, i_v_a]
    return b


def test_shift_matches_reference_semantics():
    """Our padded dynamic-slice shift equals the reference's mean-filled
    shift for every (du, dv) in the sample."""
    rng = np.random.RandomState(0)
    x = rng.rand(16, 8, 8, 3).astype(np.float32)
    r = 3
    key = jax.random.PRNGKey(42)
    shifted = np.asarray(rand_shift_batch(key, jnp.asarray(x), r))
    # Recover (du, dv) the same way the kernel drew them.
    duv = np.asarray(jax.random.randint(key, (16, 2), -r, r + 1))
    for i in range(16):
        expect = np_shift_oracle(x[i], int(duv[i, 0]), int(duv[i, 1]))
        np.testing.assert_allclose(shifted[i], expect, atol=1e-6)


def test_shift_zero_r_is_identity():
    x = jnp.ones((2, 4, 4, 1))
    out = rand_shift_batch(jax.random.PRNGKey(0), x, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_flip_gated_by_mask():
    """Examples with flip_allowed=0 are never flipped; allowed ones flip
    about half the time (scripts/lib/data.py:29-32)."""
    rng = np.random.RandomState(1)
    x = rng.rand(256, 4, 6, 1).astype(np.float32)
    allowed = np.array([0.0, 1.0] * 128, np.float32)
    out = np.asarray(rand_flip_batch(jax.random.PRNGKey(3), jnp.asarray(x),
                                     jnp.asarray(allowed)))
    flipped = np.abs(out - x[:, :, ::-1, :]).max(axis=(1, 2, 3)) < 1e-7
    unflipped = np.abs(out - x).max(axis=(1, 2, 3)) < 1e-7
    assert unflipped[allowed == 0].all()
    frac = flipped[allowed == 1].mean()
    assert 0.3 < frac < 0.7


def test_augmented_batch_labels_consistent():
    """Batch labels stay one-hot rows of the source labels; images stay in
    range."""
    rng = np.random.RandomState(2)
    x0 = rng.rand(64, 8, 8, 3).astype(np.float32)
    y = np.eye(10, dtype=np.float32)[rng.randint(0, 10, 64)]
    m_sym = np.ones(10, np.float32)
    xb, yb = augmented_batch(jax.random.PRNGKey(7), jnp.asarray(x0),
                             jnp.asarray(y), jnp.asarray(m_sym), 32, 2)
    assert xb.shape == (32, 8, 8, 3)
    assert yb.shape == (32, 10)
    np.testing.assert_allclose(np.asarray(yb).sum(axis=1), 1.0)
