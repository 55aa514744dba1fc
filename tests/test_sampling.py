"""Fixed-quota sampling: invariants matching the reference randperm logic
(models/model.py:144-158, models/model.py:225-236)."""

import numpy as np
import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.sampling import (
    _group_rank,
    _group_rank_topk,
    sample_pos_neg,
    subsample_group_to_ignore,
)


def masks(n, n_pos, n_neg, rs):
    perm = rs.permutation(n)
    pos = np.zeros(n, bool)
    neg = np.zeros(n, bool)
    pos[perm[:n_pos]] = True
    neg[perm[n_pos : n_pos + n_neg]] = True
    return jnp.asarray(pos), jnp.asarray(neg)


def test_exact_quota_plenty_of_both():
    rs = np.random.RandomState(0)
    pos, neg = masks(2000, 300, 1500, rs)
    idx, is_pos, valid = sample_pos_neg(jax.random.key(0), pos, neg, 128, 32)
    assert idx.shape == (128,)
    assert np.asarray(valid).all()
    assert np.asarray(is_pos).sum() == 32
    assert np.asarray(is_pos)[:32].all()  # positives packed first
    assert not np.asarray(is_pos)[32:].any()
    assert np.asarray(pos)[np.asarray(idx)[:32]].all()
    assert np.asarray(neg)[np.asarray(idx)[32:]].all()
    assert len(set(np.asarray(idx).tolist())) == 128  # no duplicates


def test_few_positives_fills_with_negatives():
    rs = np.random.RandomState(1)
    pos, neg = masks(500, 5, 400, rs)
    idx, is_pos, valid = sample_pos_neg(jax.random.key(1), pos, neg, 128, 32)
    assert np.asarray(is_pos).sum() == 5
    assert np.asarray(valid).all()


def test_zero_positives():
    rs = np.random.RandomState(2)
    pos, neg = masks(500, 0, 400, rs)
    idx, is_pos, valid = sample_pos_neg(jax.random.key(2), pos, neg, 128, 32)
    assert np.asarray(is_pos).sum() == 0
    assert np.asarray(valid).all()


def test_short_pools_degrade_gracefully():
    # reference asserts here (models/model.py:158); we mask instead.
    rs = np.random.RandomState(3)
    pos, neg = masks(200, 10, 50, rs)
    idx, is_pos, valid = sample_pos_neg(jax.random.key(3), pos, neg, 128, 32)
    assert np.asarray(valid).sum() == 60
    assert np.asarray(is_pos).sum() == 10


def test_sampling_is_uniform_over_group():
    rs = np.random.RandomState(4)
    pos, neg = masks(64, 48, 16, rs)
    counts = np.zeros(64)
    for s in range(400):
        idx, is_pos, _ = sample_pos_neg(jax.random.key(s), pos, neg, 40, 32)
        counts[np.asarray(idx)[np.asarray(is_pos)]] += 1
    sel = counts[np.asarray(pos)]
    # Each of 48 positives picked w.p. 32/48 per draw -> mean ~266.
    assert abs(sel.mean() - 400 * 32 / 48) < 15
    assert sel.min() > 150  # every positive gets sampled sometimes


def test_group_rank_topk_matches_group_rank_below_k():
    # _group_rank_topk is the quota-demotion fast path: exact for
    # ranks < k, everything else reported as rank n ("beyond quota").
    rs = np.random.RandomState(7)
    for trial, (n, k, p_mask) in enumerate(
        [(500, 64, 0.5), (500, 64, 0.05), (2000, 256, 0.9), (64, 64, 0.5)]
    ):
        noise = jnp.asarray(rs.uniform(size=n).astype(np.float32))
        mask = jnp.asarray(rs.uniform(size=n) < p_mask)
        full = np.asarray(_group_rank(noise, mask))
        fast = np.asarray(_group_rank_topk(noise, mask, k))
        below = full < k
        np.testing.assert_array_equal(fast[below], full[below])
        assert (fast[~below] == n).all()


def test_group_rank_topk_small_group():
    # group smaller than k: every member still gets its exact rank.
    noise = jnp.asarray(np.random.RandomState(8).uniform(size=300).astype(np.float32))
    mask = jnp.zeros(300, bool).at[jnp.array([5, 17, 250])].set(True)
    fast = np.asarray(_group_rank_topk(noise, mask, 128))
    full = np.asarray(_group_rank(noise, mask))
    np.testing.assert_array_equal(fast[np.asarray(mask)], full[np.asarray(mask)])
    assert (fast[~np.asarray(mask)] == 300).all()


def test_subsample_group_to_ignore():
    labels = jnp.concatenate([jnp.ones(300), jnp.zeros(700)]).astype(jnp.int32)
    group = labels == 1
    out = subsample_group_to_ignore(jax.random.key(0), labels, group, 128)
    out = np.asarray(out)
    assert (out == 1).sum() == 128
    assert (out == -1).sum() == 300 - 128
    assert (out == 0).sum() == 700
