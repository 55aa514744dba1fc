"""Anchor generation for both model generations.

Anchors are a closed-form pure function of the (static) padded canvas
size, so they are computed **once per shape bucket with numpy at trace
time** and become compile-time constants — unlike the reference, which
re-runs its numpy anchor maker on every forward pass
(models/model.py:310-312).

Two conventions, matching the two reference generations exactly:

* :func:`legacy_anchors` — ``FRCNNAnchorMaker`` parity (anchor.py:7-55):
  base_size 16, scales {8,16,32}, ratios {0.5,1,2} with
  ``w = 16*s*sqrt(r)``, ``h = 16*s*sqrt(1/r)``, centers offset by 8px,
  grid stride 16, ordering (y, x, ratio-major/scale-minor), normalised to
  [0,1] by the canvas (w, h).
* :func:`fpn_anchors` — torchvision ``AnchorGenerator`` parity
  (models/new_model.py:23-25): one size per FPN level
  {32,64,128,256,512}, ratios {0.5,1,2} with ``h/w = r`` (note: the
  *opposite* ratio convention), zero center offset, rounded base anchors,
  levels concatenated, normalised to [0,1] (models/new_model.py:47).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def legacy_anchor_base(
    base_size: int = 16,
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
    scales: tuple[int, ...] = (8, 16, 32),
) -> np.ndarray:
    """9 base anchors in xyxy pixels centered at (base/2, base/2).

    Parity with ``generate_anchor_base`` (anchor.py:15-32); ordering is
    ratio-major, scale-minor.
    """
    px = py = base_size / 2.0
    out = np.zeros((len(ratios) * len(scales), 4), dtype=np.float32)
    for i, r in enumerate(ratios):
        for j, s in enumerate(scales):
            w = base_size * s * np.sqrt(r)
            h = base_size * s * np.sqrt(1.0 / r)
            k = i * len(scales) + j
            out[k] = (px - w / 2.0, py - h / 2.0, px + w / 2.0, py + h / 2.0)
    return out


@functools.lru_cache(maxsize=64)
def legacy_anchors(
    height: int,
    width: int,
    base_size: int = 16,
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
    scales: tuple[int, ...] = (8, 16, 32),
) -> np.ndarray:
    """All shifted anchors for an ``height x width`` canvas, in [0,1] xyxy.

    Parity with ``_enumerate_shifted_anchor`` (anchor.py:34-55): grid of
    ``(H//16) * (W//16)`` positions at stride 16, ordering y-major then x
    then anchor index; normalised by (W, H, W, H).

    Returns ``[(H//16)*(W//16)*9, 4]`` float32.
    """
    base = legacy_anchor_base(base_size, ratios, scales)
    fh, fw = height // base_size, width // base_size
    shift_x = np.arange(fw, dtype=np.float32) * base_size
    shift_y = np.arange(fh, dtype=np.float32) * base_size
    sx, sy = np.meshgrid(shift_x, shift_y)  # 'xy': y-major rows
    shift = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    anchors = (base[None, :, :] + shift[:, None, :]).reshape(-1, 4)
    anchors /= np.array([width, height, width, height], dtype=np.float32)
    return anchors.astype(np.float32)


@functools.lru_cache(maxsize=64)
def fpn_cell_anchors(
    size: int, ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
) -> np.ndarray:
    """torchvision-style rounded base anchors for one FPN level."""
    r = np.asarray(ratios, dtype=np.float32)
    h_ratios = np.sqrt(r)
    w_ratios = 1.0 / h_ratios
    ws = w_ratios * size
    hs = h_ratios * size
    base = np.stack([-ws, -hs, ws, hs], axis=1) / 2.0
    return np.round(base).astype(np.float32)


@functools.lru_cache(maxsize=64)
def fpn_anchors(
    height: int,
    width: int,
    strides: tuple[int, ...] = (4, 8, 16, 32, 64),
    sizes: tuple[int, ...] = (32, 64, 128, 256, 512),
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """Concatenated all-level FPN anchors in [0,1] xyxy for one canvas.

    Parity with torchvision ``AnchorGenerator`` as wired in
    models/new_model.py:23-25 + the [0,1] normalisation at
    models/new_model.py:47. Level grids are ``ceil(H/stride)`` — for the
    /32-padded canvases used here this equals the conv feature sizes.
    """
    per_level = []
    for stride, size in zip(strides, sizes):
        fh = -(-height // stride)
        fw = -(-width // stride)
        base = fpn_cell_anchors(size, ratios)  # [A, 4]
        sx = np.arange(fw, dtype=np.float32) * stride
        sy = np.arange(fh, dtype=np.float32) * stride
        gx, gy = np.meshgrid(sx, sy)
        shift = np.stack([gx.ravel(), gy.ravel(), gx.ravel(), gy.ravel()], 1)
        per_level.append((shift[:, None, :] + base[None, :, :]).reshape(-1, 4))
    anchors = np.concatenate(per_level, axis=0)
    anchors /= np.array([width, height, width, height], dtype=np.float32)
    return anchors.astype(np.float32)


def inside_fraction(
    anchors: np.ndarray, extent: tuple[float, float]
) -> float:
    """Fraction of anchors lying fully inside an ``(ex, ey)`` extent.

    This is exactly the eligibility predicate of the RPN boundary
    filter (targets.py, parity with models/model.py's
    ``inside_index``): an anchor that crosses the image extent is
    excluded from both label assignment and sampling. On small
    canvases the 128-512px legacy anchors can leave almost nothing
    trainable — main.py uses this as a preflight diagnostic.
    """
    ex, ey = float(extent[0]), float(extent[1])
    inside = (
        (anchors[:, 0] >= 0.0)
        & (anchors[:, 1] >= 0.0)
        & (anchors[:, 2] <= ex)
        & (anchors[:, 3] <= ey)
    )
    return float(inside.mean()) if len(anchors) else 0.0


def num_legacy_anchors(height: int, width: int, base_size: int = 16) -> int:
    return (height // base_size) * (width // base_size) * 9


def num_fpn_anchors(
    height: int, width: int, strides: tuple[int, ...] = (4, 8, 16, 32, 64)
) -> int:
    return sum(3 * -(-height // s) * -(-width // s) for s in strides)
