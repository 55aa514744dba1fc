"""Blocked pairwise-IoU Pallas kernel.

Computes ``iou[i, j]`` for boxes_a ``[n, 4]`` x boxes_b ``[m, 4]`` on a
2-D grid of VMEM tiles. The B operand is fed pre-transposed ``[4, m]`` so
the kernel reads lane-contiguous rows and the broadcasted ``[bn, bm]``
arithmetic maps straight onto the VPU — no per-box gather, no relayout.

Replaces the ``find_jaccard_overlap`` hot spot the reference evaluates
over ``[~200k anchors x gt]`` every step (models/new_model.py:309,
SURVEY.md §3.1 "HOT").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _iou_kernel(eps, union_floor, a_ref, bt_ref, out_ref):
    ax1 = a_ref[:, 0:1]
    ay1 = a_ref[:, 1:2]
    ax2 = a_ref[:, 2:3]
    ay2 = a_ref[:, 3:4]
    bx1 = bt_ref[0:1, :]
    by1 = bt_ref[1:2, :]
    bx2 = bt_ref[2:3, :]
    by2 = bt_ref[3:4, :]

    lo_x = jnp.maximum(ax1, bx1)
    lo_y = jnp.maximum(ay1, by1)
    hi_x = jnp.minimum(ax2, bx2)
    hi_y = jnp.minimum(ay2, by2)
    inter = jnp.clip(hi_x - lo_x, 0.0) * jnp.clip(hi_y - lo_y, 0.0)

    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a + area_b - inter + eps
    if union_floor:
        union = jnp.maximum(union, union_floor)
    out_ref[:, :] = inter / union


@functools.partial(
    jax.jit, static_argnames=("eps", "block_n", "block_m", "interpret")
)
def pairwise_iou_pallas(
    boxes_a: Array,
    boxes_b: Array,
    eps: float = 1e-5,
    block_n: int = 256,
    block_m: int = 512,
    interpret: bool = False,
) -> Array:
    """[n, 4] x [m, 4] -> [n, m] IoU (union + eps denominator, matching
    ``jaccard_iou``; pass eps=0 for exact torchvision semantics)."""
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    n_pad = -(-n // block_n) * block_n
    m_pad = -(-m // block_m) * block_m
    a = jnp.pad(boxes_a.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    bt = jnp.pad(boxes_b.astype(jnp.float32), ((0, m_pad - m), (0, 0))).T

    out = pl.pallas_call(
        functools.partial(_iou_kernel, eps, 1e-12 if eps == 0 else 0.0),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=(n_pad // block_n, m_pad // block_m),
        in_specs=[
            pl.BlockSpec(
                (block_n, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, block_m), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_n, block_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(a, bt)
    return out[:n, :m]
