"""Full-split evaluation parity: the padded lax.scan evaluator must equal
the reference's ragged host-batch sum/count accumulation exactly
(reference scripts/lib/desc.py:10-22)."""

import numpy as np
import jax
import jax.numpy as jnp

from mpnn_tpu.models import (ActorNet, init_training, make_eval_split_fn,
                             state_stats)
from mpnn_tpu.models.net import Ctx
from .test_train_e2e import pyr, rcm, reg


def test_padded_scan_equals_ragged_oracle(synth_dataset):
    """synth test split is 96 examples; batch 40 -> ragged last batch of 16
    in the oracle, one masked padded batch in the scan."""
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape,
                   root=pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10)))),
                   k_cpt=1e-9)
    params, state, _ = init_training(net, seed=2)
    B = 40
    tau, k_cpt = 0.7, 1e-9

    # Scan path.
    ev = make_eval_split_fn(net, B)
    x0s, ys, mask, count = synth_dataset.padded_split("ts", B)
    sums = ev(params, state, x0s, ys, mask, tau, k_cpt)
    means_scan = {k: np.asarray(v) / count for k, v in sums.items()}

    # Ragged host oracle (mean_net_state semantics, desc.py:10-22).
    ctx = Ctx(train=False, tau=tau, eps=1e-6, k_cpt=k_cpt)
    acc = {}
    n = 0
    for x0b, yb in synth_dataset.test_set(B):
        bsz = len(x0b)
        recs, _ = net.forward(params, state, jnp.asarray(x0b),
                              jnp.asarray(yb), ctx)
        net.route_for_stats(recs, bsz, ctx)
        stats = state_stats(net, recs, jnp.asarray(yb))
        for k, v in stats.items():
            acc[k] = acc.get(k, 0) + np.sum(np.asarray(v), 0)
        n += bsz
    assert n == count
    means_oracle = {k: v / n for k, v in acc.items()}

    assert set(means_scan) == set(means_oracle)
    for k in means_scan:
        np.testing.assert_allclose(means_scan[k], means_oracle[k],
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_sweep_eval_matches_serial_eval(synth_dataset):
    """make_sweep_eval_split_fn's per-member sums equal the serial
    evaluator's, member by member."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mpnn_tpu.models import ActorNet, init_training
    from mpnn_tpu.models.steps import (make_eval_split_fn,
                                       make_sweep_eval_split_fn,
                                       stack_trees, unstack_tree)
    from .test_train_e2e import pyr, rcm, reg

    root = pyr(rcm([8, 8, 8], reg(10), rcm([8, 8], reg(10))))
    net = ActorNet(x0_shape=synth_dataset.x0_shape,
                   y_shape=synth_dataset.y_shape, root=root)
    members = [init_training(net, seed=i) for i in range(3)]
    params_s = stack_trees([m[0] for m in members])
    state_s = stack_trees([m[1] for m in members])
    k_cpts = [0.0, 1e-9, 6.4e-8]

    x0s, ys, masks, n = synth_dataset.padded_split("ts", 32)
    sweep_ev = make_sweep_eval_split_fn(net, 32)
    sums_s = sweep_ev(params_s, state_s, x0s, ys, masks, 1.0,
                      jnp.asarray(k_cpts, jnp.float32))
    serial_ev = make_eval_split_fn(net, 32)
    for i in range(3):
        sums_i = serial_ev(members[i][0], members[i][1], x0s, ys, masks,
                           1.0, k_cpts[i])
        for k in sums_i:
            np.testing.assert_allclose(np.asarray(sums_s[k])[i],
                                       np.asarray(sums_i[k]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=k)


def test_padded_split_memo_lru_eviction():
    """The padded_split device-array memo is capped (VERDICT r2 Weak #5):
    distinct (split, batch_size) keys beyond PADDED_CACHE_MAX evict the
    least-recently-used entry instead of accumulating split-sized HBM
    buffers; re-requesting an evicted key recomputes identical arrays."""
    from mpnn_tpu.data import Dataset, synth
    ds = Dataset(synth.make_synthetic(n_tr=64, n_ts=32, h=8, w=8,
                                      n_cls=4, seed=1))
    first = ds.padded_split("ts", 8)
    sizes = [8, 16, 32, 4, 2]  # 5 distinct keys > cap of 4
    for b in sizes[1:]:
        ds.padded_split("ts", b)
    assert len(ds._padded_cache) == Dataset.PADDED_CACHE_MAX
    assert ("ts", 8) not in ds._padded_cache  # LRU evicted
    # Touching an entry refreshes its LRU position.
    ds.padded_split("ts", 16)
    ds.padded_split("tr", 8)  # evicts ("ts", 32), not the refreshed 16
    assert ("ts", 16) in ds._padded_cache
    assert ("ts", 32) not in ds._padded_cache
    again = ds.padded_split("ts", 8)  # recompute after eviction
    np.testing.assert_array_equal(np.asarray(first[0]),
                                  np.asarray(again[0]))
    assert first[3] == again[3]
