"""Per-roi window-DMA MultiScaleRoIAlign kernel (v2, pipelined).

The XLA per-bin gather formulation of the FPN roi head costs ~9.5 ms/b2
at the 512-roi train budget (``..roi_align`` docstring history): the TPU
gather issues one index per output *bin* (49/roi) and streams 4x4xC
windows through the VPU. This kernel moves the whole roi to VMEM in ONE
DMA instead — per grid step it copies a ``(win_y, win_x, c)`` feature
window covering the roi's entire bilinear footprint at its assigned FPN
level out of the level-stacked buffer, then evaluates the separable
interpolation as two small MXU contractions:

    t1[q, y, c]  = sum_x Wx[q, x] * win[y, x, c]     (x-interp)
    out[p, q, c] = sum_y Wy[p, y] * t1[q, y, c]      (y-interp)

``Wy``/``Wx`` are per-BIN rows (the ``sampling_ratio^2`` sample mean
folds into the weights, see ``.._folded_bin_weights``) scattered into
window coordinates. Unlike the round-1 slot-lattice kernel this one is
*double-buffered*: step ``i`` starts the window DMA for roi ``i+1``
before computing roi ``i``, so the ~1 MB/roi copies overlap compute and
the kernel runs at HBM bandwidth instead of DMA latency (the round-1
kernel serialized start/wait per slot and lost 6x to the gather path).

Rois whose footprint exceeds the window (extreme aspect ratios at their
assigned level) are detected in the XLA prep (``fits`` mask) and
re-pooled exactly by the caller through the compacted corner-gather
fallback — same contract as the bin-window path.

Semantics match torchvision ``roi_align(aligned=False)`` (reference
consumer /root/reference/models/new_model.py:127,143): same sample
positions, validity window ``[-1, size]``, clamp and last-cell collapse
rules, fuzz-tested against ``..roi_align.multiscale_roi_align_dense``.
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

#: Minimum window cells per axis. 40 covers roi footprints up to 38
#: cells at the assigned level — every sensibly level-routed roi of
#: aspect ratio under ~2.5:1 (interior-level footprints span
#: ``14*sqrt(r)..28*sqrt(r)`` cells); beyond that the caller's corner
#: fallback takes over. The actual window also grows to cover the
#: k_max level map (clamped large rois span the whole top-level map).
WIN_BASE = 40


def _round8(v: int) -> int:
    return -(-v // 8) * 8


def window_dims(
    level_dims: tuple[tuple[int, int], ...], win_base: int = WIN_BASE
) -> tuple[int, int]:
    """Static window size from the level maps: covers ``win_base`` cells
    plus the full k_max map (top-level rois are clamped there and may
    span it); x adds 7 cells of DMA start alignment slack."""
    h_last, w_last = level_dims[-1]
    win_y = _round8(max(win_base, h_last + 2))
    win_x = _round8(max(win_base, w_last + 2) + 7)
    return win_y, win_x


def roi_window_geometry(
    rois: Array,
    level_dims: tuple[tuple[int, int], ...],
    strides: tuple[int, ...],
    output_size: int,
    sampling_ratio: int,
    win_y: int,
    win_x: int,
    w_pad: int,
):
    """Per-roi window starts + per-bin window-coordinate weight rows.

    Returns ``(ybase, xbase, wy, wx, fits)``: ``[n]`` int32 level-LOCAL
    window starts (x 8-aligned), ``[n, P, win]`` f32 folded per-bin
    weight rows (sub-sample mean and the two ``1/ratio`` factors baked
    in), and ``[n]`` bool marking rois whose footprint fits the window.
    Pure roi math — usable without features for the fallback count.
    """
    lvl = fpn_level_assignment(rois, k_min=2, k_max=2 + len(strides) - 1)
    hs = jnp.asarray([d[0] for d in level_dims], jnp.int32)[lvl]
    ws = jnp.asarray([d[1] for d in level_dims], jnp.int32)[lvl]
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]

    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    roi_w = jnp.maximum(rois[:, 2] * scale - x1, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * scale - y1, 1.0)
    ys, wy2 = _corner_starts_weights(
        _sample_coords(y1, roi_h, output_size, sampling_ratio), hs[:, None]
    )
    xs, wx2 = _corner_starts_weights(
        _sample_coords(x1, roi_w, output_size, sampling_ratio), ws[:, None]
    )

    n = rois.shape[0]
    p, u = output_size, sampling_ratio

    def axis(starts, w2, win, align, hi):
        base = jnp.min(starts, axis=1)  # [n]; starts >= 0 by contract
        if align > 1:
            base = (base // align) * align
        base = jnp.clip(base, 0, hi)
        off = starts - base[:, None]
        ok = jnp.all((off >= 0) & (off <= win - 2), axis=1)
        off = jnp.clip(off, 0, win - 2)
        iota = jnp.arange(win, dtype=jnp.int32)
        offb = off.reshape(n, p, u)
        wb2 = w2.reshape(n, p, u, 2)
        lo = (offb[..., None] == iota).astype(jnp.float32)
        hi_ = ((offb + 1)[..., None] == iota).astype(jnp.float32)
        wrow = (lo * wb2[..., 0:1] + hi_ * wb2[..., 1:2]).sum(axis=2) / u
        return base, wrow, ok

    # y: the stacked buffer is padded by win_y rows at the bottom and
    # rows past the roi's level carry zero weight, so no upper clip.
    ybase, wy, ok_y = axis(ys, wy2, win_y, 1, jnp.iinfo(jnp.int32).max)
    xbase, wx, ok_x = axis(xs, wx2, win_x, 8, w_pad - win_x)
    return ybase, xbase, wy, wx, ok_y & ok_x


def _kernel(
    win_y, win_x, p, yg_ref, xa_ref, wy_ref, wx_ref, feat_ref, out_ref,
    buf0, buf1, sem0, sem1,
):
    """Grid = (n,). Per-roi scalars: global_row_start and x start
    (8-aligned) — two 1-D prefetch operands (a single [n, 2] operand
    would be lane-padded to [n, 128] in SMEM, 64x the footprint, and
    overflows SMEM at the b8 train shape). Double-buffered: the window
    DMA for roi i+1 is in flight while roi i computes."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def copy(idx, buf, sem):
        yg = yg_ref[idx]
        xa = pl.multiple_of(xa_ref[idx], 8)
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(yg, win_y), pl.ds(xa, win_x), slice(None)],
            buf,
            sem,
        )

    @pl.when(i == 0)
    def _():
        copy(0, buf0, sem0).start()

    nxt = i + 1

    @pl.when((nxt < n) & (nxt % 2 == 0))
    def _():
        copy(nxt, buf0, sem0).start()

    @pl.when((nxt < n) & (nxt % 2 == 1))
    def _():
        copy(nxt, buf1, sem1).start()

    def compute(buf, sem):
        copy(i, buf, sem).wait()
        win = buf[:].astype(jnp.float32)  # [win_y, win_x, c]
        # x-interp: [P, win_x] x [win_y, win_x, c] -> [P(q), win_y, c]
        t1 = jax.lax.dot_general(
            wx_ref[0], win, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # y-interp: [P, win_y] x [P(q), win_y, c] -> [P(p), P(q), c]
        out_ref[0] = jax.lax.dot_general(
            wy_ref[0], t1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i % 2 == 0)
    def _():
        compute(buf0, sem0)

    @pl.when(i % 2 == 1)
    def _():
        compute(buf1, sem1)


def _batched_geometry(
    rois, level_dims, strides, output_size, sampling_ratio, win_base
):
    """Batched window geometry shared by the forward and backward
    kernels: flattened GLOBAL row starts into the level-stacked
    batch-flattened buffer, 8-aligned x starts, per-bin weight rows and
    the fits mask. Returns
    ``(ybg [B*n], xb [B*n], wy [B,n,P,win_y], wx [B,n,P,win_x],
    fits [B,n], win_y, win_x, w_pad, sum_h, row_offs)``."""
    b, n = rois.shape[:2]
    win_y, win_x = window_dims(level_dims, win_base)
    w_max = max(d[1] for d in level_dims)
    w_pad = max(_round8(w_max) + 8, win_x)
    heights = [d[0] for d in level_dims]
    sum_h = sum(heights)
    row_offs_np = np.concatenate([[0], np.cumsum(heights)[:-1]]).astype(
        np.int32
    )

    def geom(r):
        yb, xb, wy, wx, fits = roi_window_geometry(
            r, level_dims, strides, output_size, sampling_ratio,
            win_y, win_x, w_pad,
        )
        lvl = fpn_level_assignment(r, k_min=2, k_max=2 + len(strides) - 1)
        return jnp.asarray(row_offs_np)[lvl] + yb, xb, wy, wx, fits

    ybg, xb, wy, wx, fits = jax.vmap(geom)(rois)
    ybg = ybg + sum_h * jnp.arange(b, dtype=jnp.int32)[:, None]
    return (
        ybg.reshape(-1).astype(jnp.int32),
        xb.reshape(-1).astype(jnp.int32),
        wy, wx, fits, win_y, win_x, w_pad, sum_h, row_offs_np,
    )


def _bwd_kernel(
    win_y, win_x, p, n_total,
    yg_ref, xa_ref, wy_ref, wx_ref, g_ref,
    buf_in, buf_out,
    vbuf0, vbuf1, flags, rsem0, rsem1, wsem0, wsem1,
):
    """Grid = (N,). Transpose of :func:`_kernel`: per roi the upstream
    ``[P, P, c]`` gradient expands through the separable weights to a
    ``[win_y, win_x, c]`` patch (two MXU contractions) which is
    accumulated into the level-stacked buffer by a read-modify-write
    window DMA. Double-buffered like the forward — read(i+1) overlaps
    compute(i) — with a write-after-write-free hazard protocol:

      * reads/writes alternate between two VMEM window buffers, each
        with its own write semaphore;
      * before read(i+1) starts, write(i-1) is always waited (buffer
        reuse), and write(i) is waited IFF the two windows' row ranges
        overlap (callers interleave rois by sorted row start so this is
        rare — see ``roi_window_align_bwd``);
      * ``flags`` (SMEM) records whether each write semaphore's
        outstanding signal was already consumed, so every signal is
        waited exactly once (a second wait on a drained DMA semaphore
        deadlocks).

    Rois whose gradient must not land (fallback/padded) carry all-zero
    weight rows, so their RMW round-trips add zeros.
    """
    i = pl.program_id(0)

    # The RMW round-trips go through buf_out on BOTH sides: it is
    # aliased to buf_in (same HBM buffer on hardware), and the Pallas
    # interpreter initialises the aliased output from the input but does
    # not reflect output writes back into input reads — reading buf_in
    # would silently drop prior rois' contributions under interpret=True.
    del buf_in

    def rd(idx, buf, sem):
        yg = yg_ref[idx]
        xa = pl.multiple_of(xa_ref[idx], 8)
        return pltpu.make_async_copy(
            buf_out.at[pl.ds(yg, win_y), pl.ds(xa, win_x), slice(None)],
            buf,
            sem,
        )

    def wr(idx, buf, sem):
        yg = yg_ref[idx]
        xa = pl.multiple_of(xa_ref[idx], 8)
        return pltpu.make_async_copy(
            buf,
            buf_out.at[pl.ds(yg, win_y), pl.ds(xa, win_x), slice(None)],
            sem,
        )

    vbufs = (vbuf0, vbuf1)
    rsems = (rsem0, rsem1)
    wsems = (wsem0, wsem1)

    @pl.when(i == 0)
    def _():
        flags[0] = 1  # 1 = no outstanding (unwaited) write on this sem
        flags[1] = 1
        rd(0, vbuf0, rsem0).start()

    def step(par):
        vbuf, rsem, wsem = vbufs[par], rsems[par], wsems[par]
        rd(i, vbuf, rsem).wait()
        g = g_ref[0]  # [P, P, c] f32
        # x-expand: [P(q), win_x] x [P, P(q), c] -> [win_x, P, c]
        s1 = jax.lax.dot_general(
            wx_ref[0], g, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # y-expand: [P, win_y] x [win_x, P, c] -> [win_y, win_x, c]
        patch = jax.lax.dot_general(
            wy_ref[0], s1, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        vbuf[:] = vbuf[:] + patch
        wr(i, vbuf, wsem).start()
        flags[par] = 0

    @pl.when(i % 2 == 0)
    def _():
        step(0)

    @pl.when(i % 2 == 1)
    def _():
        step(1)

    nxt = i + 1

    def prefetch(par_n):
        vbuf, rsem = vbufs[par_n], rsems[par_n]
        # Buffer reuse: write(i-1) (same parity) must leave vbuf first.
        @pl.when(flags[par_n] == 0)
        def _():
            wr(nxt - 2, vbuf, wsems[par_n]).wait()

        flags[par_n] = 1
        # RMW hazard: window(i+1) must observe write(i) if rows overlap.
        par = 1 - par_n
        dy = yg_ref[nxt] - yg_ref[i]
        ov = (dy < win_y) & (dy > -win_y)

        @pl.when(ov & (flags[par] == 0))
        def _():
            wr(i, vbufs[par], wsems[par]).wait()
            flags[par] = 1

        rd(nxt, vbuf, rsem).start()

    @pl.when((nxt < n_total) & (nxt % 2 == 0))
    def _():
        prefetch(0)

    @pl.when((nxt < n_total) & (nxt % 2 == 1))
    def _():
        prefetch(1)

    # Drain: the kernel must not finish with in-flight DMAs.
    last_par = (n_total - 1) % 2

    @pl.when(i == n_total - 1)
    def _():
        if n_total >= 2:

            @pl.when(flags[1 - last_par] == 0)
            def _():
                wr(
                    n_total - 2, vbufs[1 - last_par], wsems[1 - last_par]
                ).wait()

        wr(n_total - 1, vbufs[last_par], wsems[last_par]).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "level_dims", "strides", "output_size", "sampling_ratio",
        "win_base", "interpret",
    ),
)
def roi_window_align_bwd(
    g: Array,
    rois: Array,
    level_dims: tuple[tuple[int, int], ...],
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    win_base: int = WIN_BASE,
    interpret: bool = False,
) -> tuple[tuple[Array, ...], Array]:
    """Features-gradient of the window align: scatter-accumulate kernel.

    Args:
      g: ``[B, n, P, P, c]`` upstream gradient (any float dtype).
      rois: ``[B, n, 4]`` xyxy pixel rois (must match the forward call).
      level_dims: per-level ``(h_l, w_l)`` of the feature maps.

    Returns:
      ``(dfeatures, fits)`` — per-level ``[B, h_l, w_l, c]`` float32
      gradients covering only the rois with ``fits=True`` (gradients of
      non-fitting rois are zeroed here; the caller re-derives them
      through its exact fallback path), and the ``[B, n]`` fits mask.

    Rois are processed in an interleaved sorted-by-row-start order (the
    first/second halves of the sorted order alternate), so consecutive
    grid steps touch far-apart buffer rows and the kernel's RMW hazard
    wait almost never fires.
    """
    b, n = rois.shape[:2]
    c = g.shape[-1]
    p = output_size
    ybg, xb, wy, wx, fits, win_y, win_x, w_pad, sum_h, _ = _batched_geometry(
        rois, level_dims, strides, output_size, sampling_ratio, win_base
    )
    total = b * n

    # Zero the gradient (via the weight rows) of rois the kernel must
    # not scatter: their RMW still runs but adds zeros.
    keep = fits.reshape(total, 1, 1).astype(jnp.float32)
    wy = wy.reshape(total, p, win_y) * keep
    wx = wx.reshape(total, p, win_x) * keep

    # Interleave by sorted global row start: order[2i] walks the first
    # half of the sorted order, order[2i+1] the second half.
    ranks = jnp.argsort(ybg)
    half = (total + 1) // 2
    order = (
        jnp.zeros((total,), ranks.dtype)
        .at[0::2]
        .set(ranks[:half])
        .at[1::2]
        .set(ranks[half:])
    )
    ybg = ybg[order]
    xb = xb[order]
    wy = wy[order]
    wx = wx[order]
    g = g.reshape(total, p, p, c)[order].astype(jnp.float32)

    buf0 = jnp.zeros((b * sum_h + win_y, w_pad, c), jnp.float32)
    kernel = functools.partial(_bwd_kernel, win_y, win_x, p, total)
    dbuf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(buf0.shape, jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(total,),
            in_specs=[
                pl.BlockSpec(
                    (1, p, win_y),
                    lambda i, *sc: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, p, win_x),
                    lambda i, *sc: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, p, p, c),
                    lambda i, *sc: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((win_y, win_x, c), jnp.float32),
                pltpu.VMEM((win_y, win_x, c), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        # Flattened input index 5 (2 scalar-prefetch + wy, wx, g, buf)
        # aliases output 0: the kernel accumulates in place.
        input_output_aliases={5: 0},
        interpret=interpret,
    )(ybg, xb, wy, wx, g, buf0)

    dbuf = dbuf[: b * sum_h].reshape(b, sum_h, w_pad, c)
    outs = []
    off = 0
    for h, w in level_dims:
        outs.append(dbuf[:, off : off + h, :w, :])
        off += h
    return tuple(outs), fits


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "output_size", "sampling_ratio", "win_base", "interpret"
    ),
)
def roi_window_align(
    features: tuple[Array, ...],
    rois: Array,
    strides: tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    win_base: int = WIN_BASE,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Kernel fast path over a batch of images.

    Args:
      features: per-level ``[B, h_l, w_l, c]`` maps.
      rois: ``[B, n, 4]`` xyxy in image pixel coords.

    Returns:
      ``(pooled [B, n, P, P, c] (f32), fits [B, n] bool)`` — entries
      with ``fits=False`` are garbage and must be re-pooled by the
      caller (compacted corner fallback).
    """
    b, n = rois.shape[:2]
    c = features[0].shape[-1]
    p = output_size
    level_dims = tuple((f.shape[1], f.shape[2]) for f in features)
    ybg, xb, wy, wx, fits, win_y, win_x, w_pad, sum_h, _ = _batched_geometry(
        rois, level_dims, strides, output_size, sampling_ratio, win_base
    )

    # Level-stacked, batch-flattened buffer [B*sum_h + win_y, w_pad, c].
    buf = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, 0), (0, w_pad - f.shape[2]), (0, 0)))
            for f in features
        ],
        axis=1,
    ).reshape(b * sum_h, w_pad, c)
    buf = jnp.pad(buf, ((0, win_y), (0, 0), (0, 0)))

    kernel = functools.partial(_kernel, win_y, win_x, p)
    pooled = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n, p, p, c), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b * n,),
            in_specs=[
                pl.BlockSpec(
                    (1, p, win_y),
                    lambda i, *sc: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, p, win_x),
                    lambda i, *sc: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, p, p, c), lambda i, *sc: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((win_y, win_x, c), buf.dtype),
                pltpu.VMEM((win_y, win_x, c), buf.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        interpret=interpret,
    )(
        ybg,
        xb,
        wy.reshape(b * n, p, win_y),
        wx.reshape(b * n, p, win_x),
        buf,
    )
    return pooled.reshape(b, n, p, p, c), fits
