"""RoIPool (max pooling) with fixed-shape windows.

The reference uses torchvision's C++/CUDA ``RoIPool(output_size=(7,7),
spatial_scale=1.)`` with rois pre-scaled to feature-cell coordinates
(models/model.py:97,106-113). Torchvision semantics, reproduced exactly:

* roi corners are **rounded** to integer cells: ``start = round(x1*s)``,
  ``end = round(x2*s)``,
* ``roi_extent = max(end - start + 1, 1)`` cells,
* bin ``p`` covers cells ``[start + floor(p*e/7), start + ceil((p+1)*e/7))``
  clipped to the feature map,
* value = max over the bin, 0 for empty bins.

TPU-first reformulation: bin extents are bounded by
``ceil(extent / output_size) + 1`` cells, so every bin is evaluated over a
**static-size window** (computed from the static feature shape at trace
time) with a validity mask and a masked max — no data-dependent shapes.
The max is separable (max over a rectangle = max over rows of max over
cols), so the gather cost is ``O(h * k_w + k_h)`` windows per roi instead
of ``O(k_h * k_w)`` per bin.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jax.Array


def use_pallas_ops() -> bool:
    """Kernel dispatch policy: Pallas on TPU unless FRT_FORCE_LAX_OPS=1."""
    if os.environ.get("FRT_FORCE_LAX_OPS"):
        return False
    return jax.default_backend() == "tpu"


def _bin_bounds(start: Array, extent: Array, size: Array, output_size: int):
    """Integer bin [lo, hi) bounds per output bin, clipped to [0, size).

    Computed in exact integer arithmetic: ``floor(p*e/o) == (p*e)//o`` and
    ``ceil(x) == (x + o - 1)//o``. (Float division here is a trap: under
    jit XLA rewrites ``x/7`` into ``x * (1/7)``, and e.g. ``3*14/7`` then
    lands at 6.0000005 whose ceil is 7 — off-by-one bin bounds.)
    """
    p = jnp.arange(output_size, dtype=jnp.int32)
    e = extent.astype(jnp.int32)[:, None]
    lo = (p[None, :] * e) // output_size
    hi = ((p[None, :] + 1) * e + output_size - 1) // output_size
    lo = jnp.clip(lo + start[:, None], 0, size)
    hi = jnp.clip(hi + start[:, None], 0, size)
    return lo, hi


def roi_pool(
    features: Array,
    rois: Array,
    spatial_scale: float = 1.0,
    output_size: int = 7,
    roi_chunk: int = 16,
) -> Array:
    """Max RoIPool over one feature map (Pallas kernel on TPU, lax
    fallback elsewhere — both bit-identical to torchvision semantics)."""
    if use_pallas_ops():
        from faster_rcnn_pytorch_tpu.ops.pallas.roi_pool_kernel import (
            roi_pool_pallas,
        )

        # positional args: custom_vjp nondiff argnums
        return roi_pool_pallas(features, rois, spatial_scale, output_size)
    return roi_pool_lax(
        features, rois, spatial_scale, output_size=output_size, roi_chunk=roi_chunk
    )


@functools.partial(
    jax.jit, static_argnames=("output_size", "roi_chunk")
)
def roi_pool_lax(
    features: Array,
    rois: Array,
    spatial_scale: float = 1.0,
    output_size: int = 7,
    roi_chunk: int = 16,
) -> Array:
    """Max RoIPool over one feature map.

    Args:
      features: ``[h, w, c]`` (NHWC single image).
      rois: ``[n, 4]`` xyxy boxes, scaled by ``spatial_scale`` into
        feature-cell coordinates (reference passes feature coords with
        scale 1.0, models/model.py:108-110).
      roi_chunk: rois per ``lax.map`` step (bounds transient memory).

    Returns:
      ``[n, output_size, output_size, c]``.
    """
    h, w, c = features.shape
    n = rois.shape[0]

    sx = jnp.round(rois[:, 0] * spatial_scale).astype(jnp.int32)
    sy = jnp.round(rois[:, 1] * spatial_scale).astype(jnp.int32)
    ex = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    ey = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    ext_w = jnp.maximum(ex - sx + 1, 1)
    ext_h = jnp.maximum(ey - sy + 1, 1)

    w_lo, w_hi = _bin_bounds(sx, ext_w, w, output_size)  # [n, 7]
    h_lo, h_hi = _bin_bounds(sy, ext_h, h, output_size)

    # Static per-bin window sizes: rois must lie within the feature map
    # (the [0,1]-normalised roi contract guarantees this), so the rounded
    # extent is at most size+1 cells and any bin spans at most
    # ceil((size+1)/output_size)+1 cells.
    k_w = -(-(w + 1) // output_size) + 1
    k_h = -(-(h + 1) // output_size) + 1

    neg_inf = jnp.float32(-jnp.inf)
    f32 = features.astype(jnp.float32)

    pad_n = -(-n // roi_chunk) * roi_chunk

    def pad(x):
        return jnp.pad(x, ((0, pad_n - n), (0, 0))).reshape(
            pad_n // roi_chunk, roi_chunk, output_size
        )

    def one_roi(wl, wh, hl, hh):  # each [output_size]
        # Column max: masked window max along w for every row h.
        w_idx = wl[:, None] + jnp.arange(k_w)[None, :]  # [7, kw]
        w_ok = w_idx < wh[:, None]
        w_idx = jnp.clip(w_idx, 0, w - 1)
        g = f32[:, w_idx, :]  # [h, 7, kw, c]
        g = jnp.where(w_ok[None, :, :, None], g, neg_inf)
        colmax = jnp.max(g, axis=2)  # [h, 7(pw), c]

        h_idx = hl[:, None] + jnp.arange(k_h)[None, :]  # [7, kh]
        h_ok = h_idx < hh[:, None]
        h_idx = jnp.clip(h_idx, 0, h - 1)
        g2 = colmax[h_idx]  # [7(ph), kh, 7(pw), c]
        g2 = jnp.where(h_ok[:, :, None, None], g2, neg_inf)
        binmax = jnp.max(g2, axis=1)  # [7(ph), 7(pw), c]

        empty = (hh <= hl)[:, None] | (wh <= wl)[None, :]  # [ph, pw]
        return jnp.where(empty[..., None], 0.0, binmax)

    out = jax.lax.map(
        lambda args: jax.vmap(one_roi)(*args),
        (pad(w_lo), pad(w_hi), pad(h_lo), pad(h_hi)),
    )
    out = out.reshape(pad_n, output_size, output_size, c)[:n]
    return out.astype(features.dtype)


def _roi_pool_batch_primal(features, rois, spatial_scale, output_size):
    # SMEM ceiling for the whole-batch launch: its scalar-prefetch
    # bounds array is [b*n, 4*P] s32, lane-padded to 128 columns — at
    # b8 x 300 rois that is 1.2 MB > the 1 MiB SMEM and compilation
    # fails ("prefetched SMEM operand would exceed memory"). Gate at
    # 1280 rows (640 KB of prefetch): just above legacy predict
    # b4 x 300 (1200 rows, ~614 KB — the largest shape the batched
    # launch was compile-verified on). Shapes past that (e.g.
    # b8 x 300, 1.2 MB) fall back to the vmapped per-image launch (one
    # [n, 4*P] prefetch per call); the gate deliberately hugs the
    # validated boundary rather than the theoretical 1 MiB ceiling so
    # an unvalidated shape can never hard-fail compilation (ADVICE r4).
    b, n = rois.shape[:2]
    batched_smem_ok = b * n <= 1280
    if use_pallas_ops() and batched_smem_ok:
        # One whole-batch kernel launch instead of the vmapped
        # per-image dispatch's XLA while loop (perf tie, DESIGN.md §6
        # round 3; kept as the batch-native form the SPMD rules
        # dispatch — roi_pool_kernel._roi_pool_batch_pallas_impl).
        from faster_rcnn_pytorch_tpu.ops.pallas.roi_pool_kernel import (
            roi_pool_pallas_batch,
        )

        return roi_pool_pallas_batch(
            features, rois, spatial_scale, output_size
        )
    return jax.vmap(
        lambda f, r: roi_pool(
            f, r, spatial_scale, output_size=output_size
        )
    )(features, rois)


def _roi_pool_batch_bwd_impl(features, rois, g, spatial_scale, output_size):
    _, vjp = jax.vjp(
        lambda f: _roi_pool_batch_primal(f, rois, spatial_scale, output_size),
        features,
    )
    return vjp(g)[0]


@functools.lru_cache(maxsize=None)
def _partitioned_roi_pool(spatial_scale, output_size, bwd):
    """Batch-dim SPMD rule for the (vmapped) RoIPool kernel dispatch —
    see ``ops/partition.py`` for why custom-kernel calls need one."""
    from faster_rcnn_pytorch_tpu.ops.partition import batch_partitioned

    if bwd:
        body = jax.jit(
            functools.partial(
                _roi_pool_batch_bwd_impl,
                spatial_scale=spatial_scale,
                output_size=output_size,
            )
        )
        return batch_partitioned(
            lambda features, rois, g: body(features, rois, g),
            sharding_rule="b h w c, b n f, b n p q cg -> b h w c",
            need_replication_factors=(
                "h", "w", "c", "n", "f", "p", "q", "cg"
            ),
        )
    body = jax.jit(
        functools.partial(
            _roi_pool_batch_primal,
            spatial_scale=spatial_scale,
            output_size=output_size,
        )
    )
    return batch_partitioned(
        lambda features, rois: body(features, rois),
        sharding_rule="b h w c, b n f -> b n p q co",
        need_replication_factors=("h", "w", "c", "n", "f", "p", "q", "co"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def roi_pool_batch(
    features: Array,
    rois: Array,
    spatial_scale: float = 1.0,
    output_size: int = 7,
) -> Array:
    """Batched :func:`roi_pool`: features ``[B, h, w, c]``, rois
    ``[B, n, 4]`` -> ``[B, n, P, P, c]``. On multi-device runtimes the
    dispatch goes through a batch-dim SPMD partitioning rule so the
    Pallas kernel's custom call shards over the mesh instead of
    gathering (``ops/partition.py``)."""
    from faster_rcnn_pytorch_tpu.ops.partition import (
        spmd_partition_enabled,
    )

    if not spmd_partition_enabled():
        return _roi_pool_batch_primal(
            features, rois, spatial_scale, output_size
        )
    return _partitioned_roi_pool(spatial_scale, output_size, False)(
        features, rois
    )


def _rpb_fwd(features, rois, spatial_scale, output_size):
    out = roi_pool_batch(features, rois, spatial_scale, output_size)
    return out, (features, rois)


def _rpb_bwd(spatial_scale, output_size, res, g):
    from faster_rcnn_pytorch_tpu.ops.partition import (
        spmd_partition_enabled,
    )

    features, rois = res
    if not spmd_partition_enabled():
        df = _roi_pool_batch_bwd_impl(
            features, rois, g, spatial_scale, output_size
        )
    else:
        df = _partitioned_roi_pool(spatial_scale, output_size, True)(
            features, rois, g
        )
    return df, jnp.zeros_like(rois)


roi_pool_batch.defvjp(_rpb_fwd, _rpb_bwd)
