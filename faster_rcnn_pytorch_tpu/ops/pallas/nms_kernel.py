"""Greedy NMS Pallas kernel.

Same exact algorithm as :mod:`..nms` (score-sorted tiles; one-shot
suppression by earlier tiles; Gauss-Jacobi fixpoint inside the tile), but
as one VMEM-resident kernel:

* the keep mask lives in VMEM scratch across the tile sweep — no HBM
  rematerialisation between tiles,
* the in-tile fixpoint iteration runs as a ``[1,T] @ [T,T]`` MXU matvec
  so the active mask never changes orientation (a transpose per
  iteration would relayout),
* the kernel uses an *internal* ``fori_loop`` over tiles with an empty
  grid, so ``jax.vmap`` (which prepends a batch grid dimension to
  ``pallas_call``) composes safely — every caller in this framework is
  vmapped over images or classes.

The caller (``ops.nms.nms``) does the argsort and the final fixed-size
index packing in XLA; this kernel turns sorted boxes + validity into the
greedy keep mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _nms_kernel(
    iou_threshold, tile, chunk, n_pad, boxes_ref, boxes_t_ref, valid_ref, keep_ref
):
    num_tiles = n_pad // tile
    num_chunks = n_pad // chunk
    local_i = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    local_j = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    chunk_pos = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    keep_ref[:, :] = jnp.zeros((1, n_pad), jnp.float32)

    def tile_body(t, _):
        start = pl.multiple_of(t * tile, tile)
        bx1 = boxes_ref[pl.ds(start, tile), 0:1]
        by1 = boxes_ref[pl.ds(start, tile), 1:2]
        bx2 = boxes_ref[pl.ds(start, tile), 2:3]
        by2 = boxes_ref[pl.ds(start, tile), 3:4]
        area_t = (bx2 - bx1) * (by2 - by1)

        def over_block(col_slice):
            """IoU-over-threshold block [tile, width] vs a column slice."""
            ax1 = boxes_t_ref[0:1, col_slice]
            ay1 = boxes_t_ref[1:2, col_slice]
            ax2 = boxes_t_ref[2:3, col_slice]
            ay2 = boxes_t_ref[3:4, col_slice]
            iw = jnp.clip(jnp.minimum(bx2, ax2) - jnp.maximum(bx1, ax1), 0.0)
            ih = jnp.clip(jnp.minimum(by2, ay2) - jnp.maximum(by1, ay1), 0.0)
            inter = iw * ih
            area_a = (ax2 - ax1) * (ay2 - ay1)
            union = jnp.maximum(area_t + area_a - inter, 1e-12)
            return (inter / union > iou_threshold).astype(jnp.float32)

        # Cross-tile suppression, accumulated over VMEM-sized column
        # chunks ([tile, chunk] instead of [tile, n] intermediates).
        def chunk_body(c, cross):
            c0 = pl.multiple_of(c * chunk, chunk)
            over_c = over_block(pl.ds(c0, chunk))  # [tile, chunk]
            earlier = keep_ref[0:1, pl.ds(c0, chunk)] * (
                (chunk_pos + c0) < start
            ).astype(jnp.float32)
            contrib = jax.lax.dot_general(
                earlier,
                over_c,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, tile]
            return cross + contrib

        cross = jax.lax.fori_loop(
            0, num_chunks, chunk_body, jnp.zeros((1, tile), jnp.float32)
        )
        tile_valid = valid_ref[0:1, pl.ds(start, tile)]  # [1, T]
        active0 = tile_valid * (cross <= 0.0)

        tile_over = jnp.where(
            local_i < local_j, over_block(pl.ds(start, tile)), 0.0
        )

        def cond(state):
            active, prev, it = state
            return jnp.logical_and(
                jnp.max(jnp.abs(active - prev)) > 0.0, it < tile
            )

        def body(state):
            active, _, it = state
            suppressed = jax.lax.dot_general(
                active,
                tile_over,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [1, T]
            return active0 * (suppressed <= 0.0), active, it + 1

        active, _, _ = jax.lax.while_loop(
            cond, body, (active0, jnp.zeros_like(active0), jnp.int32(0))
        )
        keep_ref[0:1, pl.ds(start, tile)] = active
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "tile", "chunk", "interpret")
)
def nms_keep_mask_pallas(
    sorted_boxes: Array,
    sorted_valid: Array,
    iou_threshold: float,
    tile: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
) -> Array:
    """Greedy keep mask over score-sorted boxes.

    Args:
      sorted_boxes: ``[n, 4]`` boxes in descending-score order, padded to
        a multiple of ``tile`` (tile must be a multiple of 128).
      sorted_valid: ``[n]`` validity of each slot.

    Returns ``[n]`` bool keep mask (sorted order).
    """
    n = sorted_boxes.shape[0]
    chunk = min(chunk, n)
    if n % chunk:
        chunk = tile  # n is always a multiple of tile
    assert n % tile == 0 and tile % 128 == 0 and n % chunk == 0, (n, tile, chunk)
    boxes = sorted_boxes.astype(jnp.float32)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, float(iou_threshold), tile, chunk, n),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, boxes.T, sorted_valid.astype(jnp.float32).reshape(1, n))
    return keep[0] > 0.0
