"""RoIAlign as batched matmuls (TPU-native, MXU-friendly).

The reference relies on torchvision's C++/CUDA ``MultiScaleRoIAlign``
(models/new_model.py:127,143). On TPU the bilinear interpolation of
RoIAlign is reformulated: since bilinear weights are separable in y and x,

    pool[n, p, q, c] = sum_h Wy[n, p, h] * sum_w Wx[n, q, w] * F[h, w, c]

so each roi's pooled output is **two matrix multiplies** against the
feature map — exactly the shape of work the MXU is built for — instead of
the reference's scattered gathers. Sample-validity and rounding semantics
match torchvision ``roi_align`` with ``aligned=False`` bit-for-bit:

* ``roi_start = x1 * scale`` (no half-pixel offset),
* ``roi_extent = max(x2*s - x1*s, 1.0)``,
* ``sampling_ratio`` samples per bin axis at
  ``start + (i + 0.5) * bin / ratio`` offsets,
* samples with coordinate outside ``[-1, size]`` contribute zero; inside
  samples clamp to ``[0, size-1]`` with the torchvision edge rule
  (``low >= size-1`` collapses to the last cell with weight 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _interp_weights(coords: Array, size: int) -> Array:
    """Bilinear interpolation row weights.

    Args:
      coords: ``[..., s]`` sample coordinates along one axis.
      size: number of cells along that axis.

    Returns:
      ``[..., s, size]`` weights; rows for out-of-range samples are zero.
    """
    valid = (coords >= -1.0) & (coords <= size)
    c = jnp.maximum(coords, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    collapse = low >= size - 1
    low = jnp.where(collapse, size - 1, low)
    c = jnp.where(collapse, low.astype(c.dtype), c)
    high = jnp.where(collapse, low, low + 1)
    frac = c - low.astype(c.dtype)

    w_low = (1.0 - frac) * valid
    w_high = frac * valid
    eye = jnp.arange(size)
    one_hot_low = (low[..., None] == eye).astype(coords.dtype)
    one_hot_high = (high[..., None] == eye).astype(coords.dtype)
    return w_low[..., None] * one_hot_low + w_high[..., None] * one_hot_high


def _sample_coords(
    start: Array, extent: Array, output_size: int, sampling_ratio: int
) -> Array:
    """[n] roi starts/extents -> [n, output_size * sampling_ratio] coords."""
    bin_size = extent / output_size
    sub = (jnp.arange(output_size * sampling_ratio) % sampling_ratio).astype(
        jnp.float32
    )
    bin_idx = (
        jnp.arange(output_size * sampling_ratio) // sampling_ratio
    ).astype(jnp.float32)
    offsets = bin_idx[None, :] * bin_size[:, None] + (
        (sub[None, :] + 0.5) * bin_size[:, None] / sampling_ratio
    )
    return start[:, None] + offsets


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "sampling_ratio", "roi_chunk"),
)
def roi_align(
    features: Array,
    rois: Array,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 32,
) -> Array:
    """RoIAlign over one feature map.

    Args:
      features: ``[h, w, c]`` (NHWC single image).
      rois: ``[n, 4]`` xyxy boxes in *image pixel* coordinates.
      spatial_scale: 1 / feature stride.
      roi_chunk: rois processed per matmul batch (bounds the transient
        ``[chunk, S, w, c]`` intermediate).

    Returns:
      ``[n, output_size, output_size, c]`` pooled features.
    """
    h, w, _ = features.shape
    n = rois.shape[0]
    s = output_size * sampling_ratio

    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    wy = _interp_weights(_sample_coords(y1, roi_h, output_size, sampling_ratio), h)
    wx = _interp_weights(_sample_coords(x1, roi_w, output_size, sampling_ratio), w)
    # wy: [n, S, h], wx: [n, S, w]

    f32 = features.astype(jnp.float32)

    pad_n = -(-n // roi_chunk) * roi_chunk
    wy = jnp.pad(wy, ((0, pad_n - n), (0, 0), (0, 0)))
    wx = jnp.pad(wx, ((0, pad_n - n), (0, 0), (0, 0)))
    wy = wy.reshape(pad_n // roi_chunk, roi_chunk, s, h)
    wx = wx.reshape(pad_n // roi_chunk, roi_chunk, s, w)

    def chunk_fn(args):
        wy_c, wx_c = args
        # [chunk*S, h] @ [h, w*c] -> [chunk, S, w, c]
        t1 = jax.lax.dot_general(
            wy_c.reshape(-1, h),
            f32.reshape(h, -1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(wy_c.shape[0], s, w, -1)
        # contract w: [chunk, S(q), w] x [chunk, S(p), w, c] -> [chunk, p, q, c]
        t2 = jnp.einsum("nqw,npwc->npqc", wx_c, t1, preferred_element_type=jnp.float32)
        return t2

    pooled = jax.lax.map(chunk_fn, (wy, wx))
    pooled = pooled.reshape(pad_n, s, s, -1)[:n]
    # Average the sampling_ratio x sampling_ratio sub-samples per bin.
    pooled = pooled.reshape(
        n, output_size, sampling_ratio, output_size, sampling_ratio, -1
    )
    return pooled.mean(axis=(2, 4)).astype(features.dtype)


def _folded_bin_weights(
    start: Array,
    extent: Array,
    size: int,
    output_size: int,
    sampling_ratio: int,
) -> Array:
    """Per-BIN interpolation rows: ``[n, output_size, size]``.

    The ``sampling_ratio^2`` bilinear samples of one bin are separable
    over axes, so their mean factors: ``mean_{u,v} Wy_u (x) Wx_v =
    (mean_u Wy_u) (x) (mean_v Wx_v)``. Folding the sub-sample mean into
    the weight rows shrinks the dense matmul formulation from ``S =
    output_size * sampling_ratio`` rows per axis to ``output_size`` —
    halving both matmul stages (at ratio 2) with identical results.
    """
    coords = _sample_coords(start, extent, output_size, sampling_ratio)
    w = _interp_weights(coords, size)  # [n, S, size]
    n = w.shape[0]
    return w.reshape(n, output_size, sampling_ratio, size).mean(axis=2)


def fpn_level_assignment(
    rois: Array,
    canonical_scale: int = 224,
    canonical_level: int = 4,
    k_min: int = 2,
    k_max: int = 5,
    eps: float = 1e-6,
) -> Array:
    """torchvision ``LevelMapper`` parity: map each roi to an FPN level.

    ``lvl = floor(canonical_level + log2(sqrt(area)/canonical_scale))``
    clamped to ``[k_min, k_max]``; returns 0-based level indices.
    Rois must be in image pixel coordinates.
    """
    area = jnp.clip(rois[:, 2] - rois[:, 0], 0) * jnp.clip(
        rois[:, 3] - rois[:, 1], 0
    )
    lvl = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + eps))
    return (jnp.clip(lvl, k_min, k_max) - k_min).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "roi_chunk"),
)
def multiscale_roi_align_dense(
    features: tuple[Array, ...],
    rois: Array,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 32,
) -> Array:
    """All-levels matmul formulation (kept as the oracle for the gather
    path below): every roi is pooled from **every** level and the per-roi
    result is selected by its assigned level — four dense matmuls and one
    select. Exact but pays P2's full map cost for every roi; measured
    37.5 ms of the 63 ms FPN predict step at 800x800 b2 (round-2 trace,
    tools/profile_stages.py)."""
    lvl = fpn_level_assignment(rois)
    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        pooled = roi_align(
            feat,
            rois,
            spatial_scale=1.0 / stride,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
            roi_chunk=roi_chunk,
        )
        sel = (lvl == i).astype(pooled.dtype)[:, None, None, None]
        out = pooled * sel if out is None else out + pooled * sel
    return out


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio", "roi_chunk"),
)
def _dense_folded(
    features: tuple[Array, ...],
    rois: Array,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 32,
) -> Array:
    """All-levels matmul formulation with the sub-sample mean folded into
    per-bin weight rows (:func:`_folded_bin_weights`) and the level
    select folded into the y-weights — same function as
    :func:`multiscale_roi_align_dense`, half the matmul FLOPs per stage.
    Exists for its VJP: the custom backward of the gather paths
    differentiates THIS formulation, so the features-gradient is pure
    (halved) matmuls."""
    lvl = fpn_level_assignment(rois, k_min=2, k_max=2 + len(strides) - 1)
    n = rois.shape[0]
    p = output_size
    out = None
    for i, (feat, stride) in enumerate(zip(features, strides)):
        h, w, _ = feat.shape
        scale = 1.0 / stride
        x1 = rois[:, 0] * scale
        y1 = rois[:, 1] * scale
        roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
        roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
        wy = _folded_bin_weights(y1, roi_h, h, p, sampling_ratio)
        wx = _folded_bin_weights(x1, roi_w, w, p, sampling_ratio)
        wy = wy * (lvl == i).astype(wy.dtype)[:, None, None]

        f32 = feat.astype(jnp.float32)
        pad_n = -(-n // roi_chunk) * roi_chunk
        wy = jnp.pad(wy, ((0, pad_n - n), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, pad_n - n), (0, 0), (0, 0)))
        wy = wy.reshape(pad_n // roi_chunk, roi_chunk, p, h)
        wx = wx.reshape(pad_n // roi_chunk, roi_chunk, p, w)

        def chunk_fn(args, f32=f32, h=h, w=w):
            wy_c, wx_c = args
            t1 = jax.lax.dot_general(
                wy_c.reshape(-1, h),
                f32.reshape(h, -1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(wy_c.shape[0], p, w, -1)
            return jnp.einsum(
                "nqw,npwc->npqc", wx_c, t1, preferred_element_type=jnp.float32
            )

        pooled = jax.lax.map(chunk_fn, (wy, wx)).reshape(pad_n, p, p, -1)[:n]
        out = pooled if out is None else out + pooled
    return out.astype(features[0].dtype)


def _corner_starts_weights(coords: Array, size: Array):
    """Per-axis window starts + 2-corner weights for a sliced gather.

    Same semantics as :func:`_interp_weights` (torchvision
    ``aligned=False`` validity/clamp/collapse rules) but expressed as a
    window of two *consecutive* cells ``[start, start+1]`` so the caller
    can gather fixed ``(2, 2, c)`` slices (one gather index per sample
    instead of four corner rows — the XLA TPU gather is index-issue
    bound, measured 2.4x on v5e). In the collapse case
    (``low == size-1``) the window is shifted down one cell and the
    weight moves to slot 1, which is exact because the collapsed
    high-corner weight is zero.

    Requires ``size >= 2`` (asserted by the caller).

    Args:
      coords: ``[..., s]`` sample coordinates along one axis.
      size: broadcastable int array — cells along that axis (per roi).

    Returns:
      ``(start, w)``: ``[..., s]`` int32 window starts and
      ``[..., s, 2]`` float32 weights for cells ``start``/``start+1``.
    """
    valid = (coords >= -1.0) & (coords <= size)
    c = jnp.maximum(coords, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    collapse = low >= size - 1
    low = jnp.where(collapse, (size - 1).astype(jnp.int32), low)
    c = jnp.where(collapse, low.astype(c.dtype), c)
    frac = c - low.astype(c.dtype)
    w_low = (1.0 - frac) * valid
    w_high = jnp.where(collapse, 0.0, frac * valid)
    start = jnp.where(collapse, low - 1, low)
    w0 = jnp.where(collapse, 0.0, w_low)
    w1 = jnp.where(collapse, w_low, w_high)
    return start, jnp.stack([w0, w1], axis=-1).astype(jnp.float32)


def _align_prep(features, rois, strides, output_size, sampling_ratio):
    """Shared prep: level-stacked buffer + per-sample corner geometry.

    Returns ``(buf, ys, xs, wy, wx, hs, ws, row_offs)`` where ``buf`` is
    the ``[sum(h_l), w_max, c]`` row-stacked level buffer, ``ys``/``xs``
    ``[n, S]`` window starts in *level-local* coords, ``wy``/``wx``
    ``[n, S, 2]`` corner weights, ``hs``/``ws`` ``[n]`` the assigned
    level's dims per roi, and ``row_offs`` ``[n]`` the level's row
    offset into ``buf``.
    """
    lvl = fpn_level_assignment(rois, k_min=2, k_max=2 + len(strides) - 1)

    w_max = max(f.shape[1] for f in features)
    buf = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, w_max - f.shape[1]), (0, 0))) for f in features],
        axis=0,
    )
    hs = jnp.asarray([f.shape[0] for f in features], jnp.int32)[lvl]
    ws = jnp.asarray([f.shape[1] for f in features], jnp.int32)[lvl]
    row_offs = jnp.asarray(
        np.concatenate([[0], np.cumsum([f.shape[0] for f in features])[:-1]]),
        jnp.int32,
    )[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    x2 = rois[:, 2] * scale
    y2 = rois[:, 3] * scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    ycoords = _sample_coords(y1, roi_h, output_size, sampling_ratio)  # [n,S]
    xcoords = _sample_coords(x1, roi_w, output_size, sampling_ratio)
    ys, wy = _corner_starts_weights(ycoords, hs[:, None])  # [n,S], [n,S,2]
    xs, wx = _corner_starts_weights(xcoords, ws[:, None])
    return buf, ys, xs, wy, wx, hs, ws, row_offs


def _align_corner_windows(buf, ys_g, xs, wy, wx, output_size, sampling_ratio, dtype):
    """(2, 2, c) corner-window gather path — one gather index per
    bilinear sample. Exact for every roi geometry; index-issue bound
    (~16 ms at 2x1000 rois, 800x800 on v5e), so the main path reserves
    it for oversized rois and uses y-pair strips otherwise."""
    n, s = ys_g.shape
    c = buf.shape[-1]
    p = output_size
    u = sampling_ratio
    # Samples are enumerated (p, q, u, v) — bin-major, sub-sample minor —
    # so the corner bilinear reduction AND the sub-sample mean fold into
    # ONE reduce over a contiguous axis; XLA then fuses
    # convert+multiply+reduce into the gather consumer without relayout
    # (other axis orders materialised an f32 copy of the whole corner
    # tensor plus a split two-stage reduce: ~6 GB HBM).
    ys_b = ys_g.reshape(n, p, u)
    xs_b = xs.reshape(n, p, u)
    starts = jnp.stack(
        [
            jnp.broadcast_to(ys_b[:, :, None, :, None], (n, p, p, u, u)),
            jnp.broadcast_to(xs_b[:, None, :, None, :], (n, p, p, u, u)),
        ],
        axis=-1,
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    g = jax.lax.gather(
        buf, starts.reshape(-1, 2), dn, slice_sizes=(2, 2, c), mode="clip"
    )  # [n*p*p*u*u, 2, 2, c] — consumed in its native layout: any
    # reshape between the gather and the first reduce forces a full
    # f32 relayout copy of the corner tensor (measured +8 ms).

    wy_b = wy.reshape(n, p, u, 2)
    wx_b = wx.reshape(n, p, u, 2)
    # w[n, p, q, u, v, a, b] = wy[n,p,u,a] * wx[n,q,v,b] / u^2
    w4 = (
        wy_b[:, :, None, :, None, :, None] * wx_b[:, None, :, None, :, None, :]
    ).reshape(n * p * p * u * u, 2, 2, 1) / float(u * u)
    s1 = (g.astype(jnp.float32) * w4).sum(axis=(1, 2))  # [M, c]
    pooled = s1.reshape(n, p * p, u * u, c).sum(axis=2)
    return pooled.reshape(n, p, p, c).astype(dtype)


#: Per-image budget for the compacted per-sample fallback inside the
#: bin-window fast path. Rois whose bin geometry does not fit a
#: ``_BIN_WIN``-cell window (aspect ratio beyond ~4:1 at their assigned
#: FPN level) are re-pooled exactly through the corner-window path; if
#: MORE than this many rois are oversized in one image, the whole call
#: falls back to the all-corner path (lax.cond), so the result is exact
#: for every input.
OVERSIZE_K = 64

#: Bin gather window cells per axis. A roi bin of size ``b`` cells needs
#: ``floor(b/2) + 2`` window cells (sampling_ratio=2); 4 covers ``b < 4``
#: i.e. roi extent < 28 cells at its level — every properly
#: level-assigned roi of aspect ratio under ~4:1.
_BIN_WIN = 4


def _bin_geometry(ys, xs, wy, wx, hs, ws, output_size, sampling_ratio, win):
    """Per-bin window starts + scattered per-axis weights.

    The ``sampling_ratio**2`` bilinear samples of one output bin factor
    over axes — ``sum_{u,v} wy_u (x) wx_v = (sum_u wy_u) (x) (sum_v
    wx_v)`` — so each bin pools from ONE ``(win, win, c)`` window with
    per-axis weight vectors built by scattering every sample's 2-corner
    weights into its window offset slots.

    Args:
      ys/xs: ``[n, S]`` per-sample level-local window starts.
      wy/wx: ``[n, S, 2]`` per-sample corner weights.
      hs/ws: ``[n]`` assigned-level dims.

    Returns:
      ``(yb, xb, wyb, wxb, fits)``: ``[n, P]`` int32 window starts
      (level-local), ``[n, P, win]`` f32 axis weights, and ``[n]`` bool
      marking rois whose every sample fits its bin window.
    """
    n, s = ys.shape
    p, u = output_size, sampling_ratio
    iota = jnp.arange(win, dtype=jnp.int32)

    def axis(starts, w2, size):
        sb = starts.reshape(n, p, u)
        base = jnp.clip(jnp.min(sb, axis=2), 0, (size - win)[:, None])  # [n,P]
        off = sb - base[:, :, None]  # [n,P,u] >= 0 by construction
        ok = jnp.all(off <= win - 2, axis=(1, 2))
        off = jnp.clip(off, 0, win - 2)
        wb2 = w2.reshape(n, p, u, 2)
        onehot_lo = (off[..., None] == iota).astype(jnp.float32)
        onehot_hi = ((off + 1)[..., None] == iota).astype(jnp.float32)
        wb = (onehot_lo * wb2[..., 0:1] + onehot_hi * wb2[..., 1:2]).sum(axis=2)
        return base, wb, ok

    yb, wyb, ok_y = axis(ys, wy, hs)
    xb, wxb, ok_x = axis(xs, wx, ws)
    return yb, xb, wyb, wxb, ok_y & ok_x


def _align_bin_windows(
    buf, row_offs, yb, xb, wyb, wxb, sampling_ratio, win, dtype
):
    """One ``(win, win, c)`` gather per output bin (n*P*P indices — 4x
    fewer than the per-sample corner path, same bytes at win=4)."""
    n, p = yb.shape
    c = buf.shape[-1]
    ybg = row_offs[:, None] + yb  # [n,P] global rows
    starts = jnp.stack(
        [
            jnp.broadcast_to(ybg[:, :, None], (n, p, p)),
            jnp.broadcast_to(xb[:, None, :], (n, p, p)),
        ],
        axis=-1,
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    g = jax.lax.gather(
        buf, starts.reshape(-1, 2), dn, slice_sizes=(win, win, c), mode="clip"
    )  # [n*P*P, win, win, c] — consumed in its native layout (DESIGN.md:
    # a reshape between gather and reduce forces a full relayout copy).
    w4 = (wyb[:, :, None, :, None] * wxb[:, None, :, None, :]).reshape(
        n * p * p, win, win, 1
    ) / float(sampling_ratio * sampling_ratio)
    pooled = (g.astype(jnp.float32) * w4).sum(axis=(1, 2))  # [n*P*P, c]
    return pooled.reshape(n, p, p, c).astype(dtype)


def _count_oversized(rois, level_dims, strides, output_size, sampling_ratio, win):
    """Number of rois whose bin geometry exceeds the ``win`` window —
    pure roi math (no features), used by the batch entry to hoist the
    fallback cond outside vmap."""
    lvl = fpn_level_assignment(rois, k_min=2, k_max=2 + len(strides) - 1)
    hs = jnp.asarray([d[0] for d in level_dims], jnp.int32)[lvl]
    ws = jnp.asarray([d[1] for d in level_dims], jnp.int32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]
    x1, y1 = rois[:, 0] * scale, rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    ys, _ = _corner_starts_weights(
        _sample_coords(y1, roi_h, output_size, sampling_ratio), hs[:, None]
    )
    xs, _ = _corner_starts_weights(
        _sample_coords(x1, roi_w, output_size, sampling_ratio), ws[:, None]
    )
    n = rois.shape[0]
    p, u = output_size, sampling_ratio

    def axis_ok(starts, size):
        sb = starts.reshape(n, p, u)
        base = jnp.clip(jnp.min(sb, axis=2), 0, (size - win)[:, None])
        return jnp.all(sb - base[:, :, None] <= win - 2, axis=(1, 2))

    return (~(axis_ok(ys, hs) & axis_ok(xs, ws))).sum()


def _single_corner(features, rois, strides, output_size, sampling_ratio):
    """All-rois per-sample corner-window path (exact for any geometry)."""
    dtype = features[0].dtype
    buf, ys, xs, wy, wx, _, _, row_offs = _align_prep(
        features, rois, strides, output_size, sampling_ratio
    )
    return _align_corner_windows(
        buf, row_offs[:, None] + ys, xs, wy, wx, output_size, sampling_ratio, dtype
    )


def _corner_batch_chunked(features, rois, strides, output_size, sampling_ratio):
    """``vmap(_single_corner)`` with the roi axis processed in fixed
    chunks (``lax.map``), bounding the branch's gather + f32-convert
    temporaries to ``FRT_ALIGN_FALLBACK_BUDGET`` bytes (default 1 GiB).

    ``lax.cond`` allocates HBM as the MAX over branches, so the
    exactness fallback's temporaries set the whole program's peak even
    when the branch never executes — unchunked, the fallback's
    ``[B*n*p^2*u^2, 2, 2, c]`` corner tensor is 18 GB at b16 x 1000
    rois x 256 ch (measured OOM on a 16 GB v5e; 2026-08-20). Chunking
    only reshapes the scan axis — same math per roi; XLA fuses the
    lax.map body separately from a flat vmap, so outputs agree to a few
    f32 ulps of the interpolation terms, not bitwise."""
    import os

    b, n = rois.shape[0], rois.shape[1]
    c = features[0].shape[-1]
    p, u = output_size, sampling_ratio
    single = lambda f, r: _single_corner(  # noqa: E731
        f, r, strides, output_size, sampling_ratio
    )
    budget = int(os.environ.get("FRT_ALIGN_FALLBACK_BUDGET", 1 << 30))
    itemsize = jnp.dtype(features[0].dtype).itemsize
    per_roi = b * (p * p * u * u) * 4 * c * (itemsize + 4)
    m = max(1, min(n, budget // max(per_roi, 1)))
    if m >= n:
        return jax.vmap(single)(features, rois)
    steps = -(-n // m)
    rp = jnp.pad(rois, ((0, 0), (0, steps * m - n), (0, 0)))
    rp = rp.reshape(b, steps, m, 4).transpose(1, 0, 2, 3)  # [steps,b,m,4]
    out = jax.lax.map(lambda r: jax.vmap(single)(features, r), rp)
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(b, steps * m, p, p, c)
    return out[:, :n]


def _single_fast(features, rois, strides, output_size, sampling_ratio):
    """Bin-window gather + compacted corner-window fallback for up to
    ``OVERSIZE_K`` oversized rois. Exact iff at most ``OVERSIZE_K`` rois
    are oversized — callers guard with :func:`_count_oversized`."""
    dtype = features[0].dtype
    n = rois.shape[0]
    win = _BIN_WIN
    buf, ys, xs, wy, wx, hs, ws, row_offs = _align_prep(
        features, rois, strides, output_size, sampling_ratio
    )
    yb, xb, wyb, wxb, fits = _bin_geometry(
        ys, xs, wy, wx, hs, ws, output_size, sampling_ratio, win
    )
    pooled = _align_bin_windows(
        buf, row_offs, yb, xb, wyb, wxb, sampling_ratio, win, dtype
    )
    k = min(OVERSIZE_K, n)
    _, sel = jax.lax.top_k((~fits).astype(jnp.float32), k)
    ys_g = row_offs[:, None] + ys
    fb = _align_corner_windows(
        buf, ys_g[sel], xs[sel], wy[sel], wx[sel], output_size, sampling_ratio, dtype
    )
    return pooled.at[sel].set(fb)


def _batch_window_kernel(
    features, rois, strides, output_size, sampling_ratio, interpret=False
):
    """Pallas window-DMA fast path + compacted per-image corner fallback
    for up to ``OVERSIZE_K`` window-overflowing rois per image. Callers
    guard overflow with the ``fits`` geometry (global corner cond)."""
    from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
        roi_window_align,
    )

    dtype = features[0].dtype
    n = rois.shape[1]
    pooled, fits = roi_window_align(
        features, rois, strides, output_size, sampling_ratio,
        interpret=interpret,
    )
    k = min(OVERSIZE_K, n)

    def per_image(f_img, r_img, pooled_img, fits_img):
        _, sel = jax.lax.top_k((~fits_img).astype(jnp.float32), k)
        fb = _single_corner(
            f_img, r_img[sel], strides, output_size, sampling_ratio
        )
        return pooled_img.astype(dtype).at[sel].set(fb)

    return jax.vmap(per_image)(features, rois, pooled, fits)


def _window_kernel_mode() -> str:
    """Window-kernel dispatch: ``""`` (disabled), ``"tpu"`` (real
    kernel), or ``"interpret"`` (Pallas interpreter — any backend;
    test-only, set ``FRT_ALIGN_KERNEL=interpret``)."""
    import os

    v = os.environ.get("FRT_ALIGN_KERNEL", "1")
    if v == "0":
        return ""
    if v == "interpret":
        return "interpret"
    return "tpu" if jax.default_backend() == "tpu" else ""


def _window_kernel_enabled() -> bool:
    return _window_kernel_mode() != ""


def _msra_batch_primal(
    features,
    rois,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
):
    """Dispatch body of :func:`multiscale_roi_align_batch` (shape
    polymorphic over the batch dim — also the per-shard lowering of its
    SPMD partitioning rule).

    On TPU the fast path is the pipelined per-roi window-DMA Pallas
    kernel (ops/pallas/roi_window_kernel.py; measured on the chip at
    800-canvas b2: 4.41 vs 6.75 ms at 512 rois, 7.08 vs 11.18 ms at
    1000 rois — ~1.55x over the bin-window gather; disable with
    ``FRT_ALIGN_KERNEL=0``); elsewhere the XLA bin-window gather. The fast/corner dispatch cond is hoisted OUTSIDE the batch
    vmap (a vmapped cond lowers to a select that executes both paths):
    one image with more oversized rois than the compaction budget routes
    the whole batch through the corner path."""
    from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
        roi_window_geometry,
        window_dims,
        _round8,
    )

    level_dims = tuple((f.shape[1], f.shape[2]) for f in features)
    if min(min(d) for d in level_dims) < _BIN_WIN:
        return _corner_batch_chunked(
            features, rois, strides, output_size, sampling_ratio
        )
    k = min(OVERSIZE_K, rois.shape[1])

    # The kernel's [win_y, win_x, c] VMEM windows need lane-aligned
    # channels (Mosaic rejects the in-kernel reshape otherwise —
    # measured: c=6 fails to compile, c=256 is the production shape).
    kernel_mode = _window_kernel_mode()
    use_kernel = kernel_mode != "" and features[0].shape[-1] % 128 == 0
    if use_kernel:
        win_y, win_x = window_dims(level_dims)
        w_pad = max(_round8(max(d[1] for d in level_dims)) + 8, win_x)
        over = jax.vmap(
            lambda r: (
                ~roi_window_geometry(
                    r, level_dims, strides, output_size, sampling_ratio,
                    win_y, win_x, w_pad,
                )[4]
            ).sum()
        )(rois).max()
        fast = lambda _: _batch_window_kernel(  # noqa: E731
            features, rois, strides, output_size, sampling_ratio,
            interpret=kernel_mode == "interpret",
        )
    else:
        over = jax.vmap(
            lambda r: _count_oversized(
                r, level_dims, strides, output_size, sampling_ratio, _BIN_WIN
            )
        )(rois).max()
        fast = lambda _: jax.vmap(  # noqa: E731
            lambda f, r: _single_fast(f, r, strides, output_size, sampling_ratio)
        )(features, rois)

    return jax.lax.cond(
        over <= k,
        fast,
        lambda _: _corner_batch_chunked(
            features, rois, strides, output_size, sampling_ratio
        ),
        None,
    )


@functools.lru_cache(maxsize=None)
def _partitioned_msra(strides, output_size, sampling_ratio, n_levels):
    """Batch-dim SPMD rule for the forward dispatch (see
    ``ops/partition.py`` for why custom-kernel calls need one). The body
    is jitted so trace-time numpy constants (level dims, row offsets)
    fold into the inner jaxpr — custom_partitioning rejects closed-over
    array consts."""
    from faster_rcnn_pytorch_tpu.ops.partition import batch_partitioned

    body = jax.jit(
        functools.partial(
            _msra_batch_primal,
            strides=strides,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
        )
    )

    ops = ", ".join(f"b h{i} w{i} c{i}" for i in range(n_levels))
    repl = tuple(
        x for i in range(n_levels) for x in (f"h{i}", f"w{i}", f"c{i}")
    ) + ("n", "f", "p", "q", "co")
    return batch_partitioned(
        lambda features, rois: body(features, rois),
        sharding_rule=f"{ops}, b n f -> b n p q co",
        need_replication_factors=repl,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def multiscale_roi_align_batch(
    features,
    rois,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
):
    """Batched :func:`multiscale_roi_align`: features ``[B, h_l, w_l, c]``
    per level, rois ``[B, n, 4]`` -> ``[B, n, P, P, c]``. Dispatch body
    in :func:`_msra_batch_primal`; on multi-device runtimes it goes
    through the batch-dim SPMD partitioning rule
    (:func:`_partitioned_msra`); custom VJP below."""
    from faster_rcnn_pytorch_tpu.ops.partition import (
        spmd_partition_enabled,
    )

    if not spmd_partition_enabled():
        return _msra_batch_primal(
            features, rois, strides, output_size, sampling_ratio
        )
    return _partitioned_msra(
        strides, output_size, sampling_ratio, len(features)
    )(features, rois)


def _msra_batch_fwd(features, rois, strides, output_size, sampling_ratio):
    out = multiscale_roi_align_batch(
        features, rois, strides, output_size, sampling_ratio
    )
    return out, (features, rois)


def _dense_vjp(features, rois, g, strides, output_size, sampling_ratio):
    """Features-gradient through the folded dense-matmul formulation."""
    _, vjp = jax.vjp(
        lambda f: jax.vmap(
            lambda f2, r: _dense_folded(
                f2, r, strides, output_size, sampling_ratio
            )
        )(f, rois),
        features,
    )
    (df,) = vjp(g)
    return df


def _msra_batch_bwd(strides, output_size, sampling_ratio, res, g):
    """Features-gradient of the batched align.

    On TPU (production channel counts) the fast path is the Pallas
    scatter-accumulate kernel (ops/pallas/roi_window_kernel.py
    ``roi_window_align_bwd``): per roi the upstream gradient expands to
    its window patch on the MXU and is accumulated into the
    level-stacked buffer by RMW window DMAs. Rois whose footprint
    overflows the window get their gradient through a compacted
    (``OVERSIZE_K``/image) dense-matmul VJP instead, mirroring the
    forward's corner fallback; if an image overflows the compaction
    budget the whole batch falls back to the dense VJP
    (:func:`_dense_folded` — see :func:`_msra_bwd`). Both formulations
    differentiate the same exact function, so either branch is a valid
    adjoint. Like the forward, the computation is wrapped in a batch-dim
    SPMD partitioning rule (:func:`_partitioned_msra_bwd`) so the
    backward kernel's custom call shards over the mesh instead of
    gathering."""
    from faster_rcnn_pytorch_tpu.ops.partition import (
        spmd_partition_enabled,
    )

    features, rois = res
    if not spmd_partition_enabled():
        df = _msra_bwd_impl(
            features, rois, g, strides, output_size, sampling_ratio
        )
    else:
        df = _partitioned_msra_bwd(
            strides, output_size, sampling_ratio, len(features)
        )(features, rois, g)
    return df, jnp.zeros_like(rois)


@functools.lru_cache(maxsize=None)
def _partitioned_msra_bwd(strides, output_size, sampling_ratio, n_levels):
    """Batch-dim SPMD rule for the backward — see
    :func:`_partitioned_msra`."""
    from faster_rcnn_pytorch_tpu.ops.partition import batch_partitioned

    body = jax.jit(
        functools.partial(
            _msra_bwd_impl,
            strides=strides,
            output_size=output_size,
            sampling_ratio=sampling_ratio,
        )
    )

    ops = ", ".join(f"b h{i} w{i} c{i}" for i in range(n_levels))
    repl = tuple(
        x for i in range(n_levels) for x in (f"h{i}", f"w{i}", f"c{i}")
    ) + ("n", "f", "p", "q", "cg")
    return batch_partitioned(
        lambda features, rois, g: body(features, rois, g),
        sharding_rule=f"{ops}, b n f, b n p q cg -> {ops}",
        need_replication_factors=repl,
    )


def _msra_bwd_impl(features, rois, g, strides, output_size, sampling_ratio):
    """Per-shard backward dispatch body (see :func:`_msra_batch_bwd`)."""
    import os

    level_dims = tuple((f.shape[1], f.shape[2]) for f in features)
    kernel_mode = _window_kernel_mode()
    # On-chip validated by tools/microbench_align_bwd.py (v5e): the RMW
    # hazard protocol holds on overlap-heavy roi clumps and the kernel
    # beats the dense VJP (10.7 vs 12.5 ms b2x512, 20.5 vs 25.0 ms
    # b2x1000), so it is the TPU default; FRT_ALIGN_BWD_KERNEL=0 forces
    # the dense-matmul VJP fallback.
    bwd_on_tpu = os.environ.get("FRT_ALIGN_BWD_KERNEL", "1") == "1"
    use_kernel = (
        (kernel_mode == "interpret" or (kernel_mode == "tpu" and bwd_on_tpu))
        and features[0].shape[-1] % 128 == 0
        and min(min(d) for d in level_dims) >= _BIN_WIN
    )
    if not use_kernel:
        return _dense_vjp(
            features, rois, g, strides, output_size, sampling_ratio
        )

    from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
        _round8,
        roi_window_align_bwd,
        roi_window_geometry,
        window_dims,
    )

    k = min(OVERSIZE_K, rois.shape[1])
    win_y, win_x = window_dims(level_dims)
    w_pad = max(_round8(max(d[1] for d in level_dims)) + 8, win_x)
    over = jax.vmap(
        lambda r: (
            ~roi_window_geometry(
                r, level_dims, strides, output_size, sampling_ratio,
                win_y, win_x, w_pad,
            )[4]
        ).sum()
    )(rois).max()

    def kernel_branch(_):
        dfs, fits = roi_window_align_bwd(
            g, rois, level_dims, strides, output_size, sampling_ratio,
            interpret=kernel_mode == "interpret",
        )

        # Compacted dense VJP for the (rare) non-fitting rois; padded
        # slots (fitting rois picked by top_k) carry zero gradient.
        def sel_img(r_img, g_img, fits_img):
            _, sel = jax.lax.top_k((~fits_img).astype(jnp.float32), k)
            gz = g_img[sel] * (~fits_img[sel])[:, None, None, None].astype(
                g_img.dtype
            )
            return r_img[sel], gz

        r_sel, g_sel = jax.vmap(sel_img)(rois, g, fits)
        df2 = _dense_vjp(
            features, r_sel, g_sel, strides, output_size, sampling_ratio
        )
        return tuple(
            (a + b.astype(jnp.float32)).astype(f.dtype)
            for a, b, f in zip(dfs, df2, features)
        )

    df = jax.lax.cond(
        over <= k,
        kernel_branch,
        lambda _: _dense_vjp(
            features, rois, g, strides, output_size, sampling_ratio
        ),
        None,
    )
    return df


multiscale_roi_align_batch.defvjp(_msra_batch_fwd, _msra_batch_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def multiscale_roi_align(
    features: tuple[Array, ...],
    rois: Array,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_chunk: int = 32,  # kept for API parity; unused by the gather path
) -> Array:
    """FPN-level-assigning RoIAlign (``MultiScaleRoIAlign`` parity,
    models/new_model.py:127) — per-bin window gather formulation.

    TPU-native strategy: all level maps are stacked row-wise into one
    ``[sum(h_l), w_max, c]`` buffer; each output BIN gathers one
    ``(4, 4, c)`` window in its roi's assigned-level coordinates, and
    the bin's ``sampling_ratio^2`` bilinear samples are applied as
    separable per-axis weight vectors (the sample sum factors over
    axes). Rois too elongated for the 4-cell window (aspect beyond
    ~4:1 at their level) are re-pooled exactly through a compacted
    per-sample corner-window gather (budget ``OVERSIZE_K``); if even
    that budget overflows, a ``lax.cond`` reroutes the whole call
    through the all-corner path — so the result is exact for EVERY
    input, with the fast path covering every realistic scene.
    Oracle-fuzzed vs :func:`multiscale_roi_align_dense`.

    Evolution, measured on v5e at 800x800 b2 x 1000 rois (the XLA TPU
    gather is index-issue bound at ~23M indices/s, and einsum consumers
    of gathers trigger multi-GB f32 relayout copies):
    dense all-levels matmul 37.5 ms -> per-corner row gather 18.7 ->
    per-sample corner windows 16.7 -> THIS per-bin window path (4x
    fewer indices, same bytes). Rejected with measurements: y-pair
    (2,56,c) strips + MXU x-interp (26-29 ms — the contraction
    relayouts outweigh the 14x index reduction), an unpipelined Pallas
    window-DMA kernel (61.6 ms, ops/pallas/roi_align_kernel.py), and a
    level-concat conv for the RPN head (same relayout trap).

    Args:
      features: per-level ``[h_l, w_l, c]`` maps (P2..P5), every
        ``h_l, w_l >= 2``.
      rois: ``[n, 4]`` xyxy in image pixel coordinates.
    """
    assert all(f.shape[0] >= 2 and f.shape[1] >= 2 for f in features), (
        "multiscale_roi_align requires every level map >= 2x2"
    )

    if min(min(f.shape[0], f.shape[1]) for f in features) < _BIN_WIN:
        return _single_corner(features, rois, strides, output_size, sampling_ratio)

    level_dims = tuple((f.shape[0], f.shape[1]) for f in features)
    over = _count_oversized(
        rois, level_dims, strides, output_size, sampling_ratio, _BIN_WIN
    )
    return jax.lax.cond(
        over <= min(OVERSIZE_K, rois.shape[0]),
        lambda _: _single_fast(features, rois, strides, output_size, sampling_ratio),
        lambda _: _single_corner(features, rois, strides, output_size, sampling_ratio),
        None,
    )


def _msra_fwd(features, rois, strides, output_size, sampling_ratio, roi_chunk):
    out = multiscale_roi_align(
        features, rois, strides, output_size, sampling_ratio, roi_chunk
    )
    return out, (features, rois)


def _msra_bwd(strides, output_size, sampling_ratio, roi_chunk, res, g):
    """Gradient through the DENSE matmul formulation: autodiff of the
    corner-window gather emits a 392k-index scatter-add whose cost is
    catastrophic on TPU (FPN train fwd+bwd measured 861 ms vs ~80 at
    round 1). The dense path computes the same function, so its VJP —
    pure matmuls — is the exact features-gradient. Rois carry no
    gradient by design (proposals are stop_gradient'ed upstream,
    reference models/model.py:55; gt-derived rois are input data)."""
    features, rois = res
    _, vjp = jax.vjp(
        lambda f: _dense_folded(
            f, rois, strides, output_size, sampling_ratio, roi_chunk
        ),
        features,
    )
    (df,) = vjp(g)
    return df, jnp.zeros_like(rois)


multiscale_roi_align.defvjp(_msra_fwd, _msra_bwd)
