"""Fixed-size positive/negative sampling.

The reference samples training examples with dynamic-shape ``randperm``
index tricks (models/model.py:144-158 for 32-pos/128-total RoIs,
models/model.py:225-236 for 128-pos/256-total RPN anchors,
models/new_model.py:169-182 for 128/512). On TPU the sample count must be
static, so sampling is reformulated as **noise-keyed ranking**:

* every candidate draws i.i.d. uniform noise,
* positives are ranked among positives, negatives among negatives
  (rank = position in a descending sort of the noise, restricted to the
  group — computed with one argsort per group),
* a positive is selected iff ``pos_rank < pos_quota``; a negative iff
  ``neg_rank < total - n_pos`` where ``n_pos = min(pos_quota, #pos)``.

This reproduces the reference's distribution exactly (a uniform random
subset of each group) with static shapes, and degrades gracefully when a
group is short instead of asserting (models/model.py:158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _group_rank(noise: Array, mask: Array) -> Array:
    """Rank of each element inside its mask group by descending noise.

    Elements outside the group get rank >= group size (never selected).
    ``noise`` and ``mask`` are [n]; returns int32 [n].
    """
    key = jnp.where(mask, noise, -jnp.inf)
    order = jnp.argsort(-key)  # group members first, shuffled
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return jnp.where(mask, rank, jnp.int32(noise.shape[0])).astype(jnp.int32)


def _group_rank_topk(noise: Array, mask: Array, k: int) -> Array:
    """:func:`_group_rank` exact for ranks ``< k``; every other element
    reports rank ``n`` (i.e. "beyond any quota").

    Quota demotion only ever tests ``rank < quota`` with ``quota <= k``,
    so this is a drop-in — and on a 160k-anchor FPN assignment it
    replaces a full argsort + n-element scatter (scatters are the
    slowest primitive on TPU, DESIGN.md §2) with a ``top_k`` and a
    k-element scatter. Tie-breaking matches ``argsort(-key)``'s
    lowest-index-first, so results are identical for distinct noise.
    """
    n = noise.shape[0]
    if k >= n:
        return _group_rank(noise, mask)
    key = jnp.where(mask, noise, -jnp.inf)
    _, idx = jax.lax.top_k(key, k)  # descending; ties -> lowest index
    rank = jnp.full((n,), n, jnp.int32).at[idx].set(jnp.arange(k, dtype=jnp.int32))
    return jnp.where(mask, rank, jnp.int32(n)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_samples", "pos_quota"))
def sample_pos_neg(
    rng: Array,
    pos_mask: Array,
    neg_mask: Array,
    num_samples: int,
    pos_quota: int,
):
    """Sample exactly ``num_samples`` slots: up to ``pos_quota`` positives,
    the remainder negatives, both uniformly at random within their group.

    Args:
      rng: PRNG key.
      pos_mask / neg_mask: [n] bool, disjoint candidate groups.
      num_samples: output size (128 RoIs / 256 RPN anchors / 512 FPN RoIs).
      pos_quota: max positives (32 / 128).

    Returns:
      ``idx [num_samples]`` int32 candidate indices (positives first, in
      random order, then negatives — matching the reference's
      ``cat([pos_index, neg_index])`` layout, models/model.py:160),
      ``is_pos [num_samples]`` bool, ``valid [num_samples]`` bool (False
      only when the pools are too small to fill the budget; the reference
      asserts in that case).
    """
    k_pos, k_neg = jax.random.split(rng)
    n = pos_mask.shape[0]
    pos_noise = jax.random.uniform(k_pos, (n,))
    neg_noise = jax.random.uniform(k_neg, (n,))

    n_pos_avail = jnp.sum(pos_mask)
    n_pos = jnp.minimum(n_pos_avail, pos_quota).astype(jnp.int32)

    pos_rank = _group_rank(pos_noise, pos_mask)
    neg_rank = _group_rank(neg_noise, neg_mask)

    sel_pos = pos_rank < n_pos
    sel_neg = neg_rank < (num_samples - n_pos)

    # Pack: positives occupy slots [0, n_pos), negatives follow.
    slot = jnp.where(
        sel_pos,
        pos_rank,
        jnp.where(sel_neg, n_pos + neg_rank, jnp.int32(n)),
    )
    order = jnp.argsort(slot)[:num_samples]
    idx = order.astype(jnp.int32)
    taken = (sel_pos | sel_neg)[idx]
    is_pos = sel_pos[idx] & taken
    return idx, is_pos, taken


def subsample_group_to_ignore(
    rng: Array,
    labels: Array,
    group_mask: Array,
    quota: Array,
):
    """Demote a uniform random subset of ``group_mask`` beyond ``quota`` to -1.

    Mirrors the RPN label subsampling that converts excess pos/neg labels
    to ignore (models/model.py:225-236): all but ``quota`` randomly-chosen
    members of the group keep their label; the rest become -1 (ignore).
    ``quota`` may be a traced int32 scalar.
    """
    n = labels.shape[0]
    noise = jax.random.uniform(rng, (n,))
    rank = _group_rank(noise, group_mask)
    demote = group_mask & (rank >= quota)
    return jnp.where(demote, -1, labels)
