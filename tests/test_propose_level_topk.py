"""Exactness of the per-level top-k decomposition in propose().

The FPN propose path selects pre_k from ~159k concatenated per-level
anchor scores with one global lax.top_k. FRT_LEVEL_TOPK=1 switches to a
per-level top-k + merge, which must be output-identical — including tie
ordering — because NMS consumes the ordering (assume_sorted=True) and
downstream roi sampling consumes the roi order.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.models.anchors import fpn_level_sizes
from faster_rcnn_pytorch_tpu.models.rpn import propose


def _random_inputs(rng, level_sizes, tie_quantize=64):
    n = sum(level_sizes)
    # Quantized logits force plenty of exact score ties across and
    # within levels, the only place the two selection orders could
    # legally diverge.
    cls = rng.integers(0, tie_quantize, size=(n, 2)).astype(np.float32) / 8.0
    reg = rng.normal(scale=0.2, size=(n, 4)).astype(np.float32)
    cxy = rng.uniform(0.05, 0.95, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(0.0, 0.2, size=(n, 2)).astype(np.float32)  # some tiny
    anchors = np.concatenate([cxy - wh / 2, cxy + wh / 2], axis=1)
    return jnp.asarray(cls), jnp.asarray(reg), jnp.asarray(anchors)


@pytest.mark.parametrize("pre_k", [256, 2000])
def test_level_topk_matches_global(monkeypatch, pre_k):
    # Levels big enough in total to engage the top_k regime (>65536).
    level_sizes = fpn_level_sizes(512, 672)
    assert sum(level_sizes) > 65536
    rng = np.random.default_rng(0)
    cls, reg, anchors = _random_inputs(rng, level_sizes)
    extent = jnp.asarray([0.9, 0.8], jnp.float32)

    kw = dict(pre_k=pre_k, post_k=128, nms_iou=0.7, nms_tile=256)

    monkeypatch.delenv("FRT_LEVEL_TOPK", raising=False)
    base = propose(cls, reg, anchors, extent, **kw)

    monkeypatch.setenv("FRT_LEVEL_TOPK", "1")
    lvl = propose(
        cls, reg, anchors, extent, level_sizes=level_sizes, **kw
    )

    np.testing.assert_array_equal(np.asarray(base.valid), np.asarray(lvl.valid))
    np.testing.assert_array_equal(
        np.asarray(base.scores), np.asarray(lvl.scores)
    )
    np.testing.assert_array_equal(np.asarray(base.rois), np.asarray(lvl.rois))


def test_level_topk_selection_order_with_ties(monkeypatch):
    # Direct check of the selection stage ordering: heavy ties spanning
    # level boundaries must come out in global-index order.
    level_sizes = (40000, 20000, 6000, 1500, 400)
    n = sum(level_sizes)
    assert n > 65536
    rng = np.random.default_rng(1)
    score = rng.integers(0, 7, size=n).astype(np.float32)
    k = 500

    g_s, g_i = jax.lax.top_k(jnp.asarray(score), k)

    cand_s, cand_i = [], []
    off = 0
    for n_l in level_sizes:
        k_l = min(k, n_l)
        s_l, i_l = jax.lax.top_k(jnp.asarray(score[off : off + n_l]), k_l)
        cand_s.append(s_l)
        cand_i.append(i_l + off)
        off += n_l
    cs = jnp.concatenate(cand_s)
    ci = jnp.concatenate(cand_i)
    m_s, m_pos = jax.lax.top_k(cs, k)
    m_i = ci[m_pos]

    np.testing.assert_array_equal(np.asarray(g_s), np.asarray(m_s))
    np.testing.assert_array_equal(np.asarray(g_i), np.asarray(m_i))
