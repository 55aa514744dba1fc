"""RoIAlign / RoIPool parity vs numpy oracles that implement the exact
torchvision C++ semantics (the ops the reference delegates to,
models/model.py:97, models/new_model.py:127)."""

import jax
import numpy as np
import jax.numpy as jnp

from faster_rcnn_pytorch_tpu.ops.roi_align import (
    roi_align,
    multiscale_roi_align,
    fpn_level_assignment,
)
from faster_rcnn_pytorch_tpu.ops.roi_pool import roi_pool


def bilinear(feat, y, x):
    h, w, _ = feat.shape
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1])
    y = max(y, 0.0)
    x = max(x, 0.0)
    yl, xl = int(y), int(x)
    if yl >= h - 1:
        yh = yl = h - 1
        y = float(yl)
    else:
        yh = yl + 1
    if xl >= w - 1:
        xh = xl = w - 1
        x = float(xl)
    else:
        xh = xl + 1
    ly, lx = y - yl, x - xl
    return (
        (1 - ly) * (1 - lx) * feat[yl, xl]
        + (1 - ly) * lx * feat[yl, xh]
        + ly * (1 - lx) * feat[yh, xl]
        + ly * lx * feat[yh, xh]
    )


def np_roi_align(feat, rois, scale, out=7, ratio=2):
    n = len(rois)
    c = feat.shape[-1]
    res = np.zeros((n, out, out, c), dtype=np.float64)
    for i, (x1, y1, x2, y2) in enumerate(rois):
        sx, sy = x1 * scale, y1 * scale
        rw = max(x2 * scale - sx, 1.0)
        rh = max(y2 * scale - sy, 1.0)
        bw, bh = rw / out, rh / out
        for ph in range(out):
            for pw in range(out):
                acc = np.zeros(c)
                for iy in range(ratio):
                    y = sy + ph * bh + (iy + 0.5) * bh / ratio
                    for ix in range(ratio):
                        x = sx + pw * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear(feat, y, x)
                res[i, ph, pw] = acc / (ratio * ratio)
    return res


def np_roi_pool(feat, rois, scale, out=7):
    h, w, c = feat.shape
    n = len(rois)
    res = np.zeros((n, out, out, c), dtype=np.float64)
    for i, (x1, y1, x2, y2) in enumerate(rois):
        sx = int(round(x1 * scale))
        sy = int(round(y1 * scale))
        ex = int(round(x2 * scale))
        ey = int(round(y2 * scale))
        rw = max(ex - sx + 1, 1)
        rh = max(ey - sy + 1, 1)
        for ph in range(out):
            hs = min(max(sy + int(np.floor(ph * rh / out)), 0), h)
            he = min(max(sy + int(np.ceil((ph + 1) * rh / out)), 0), h)
            for pw in range(out):
                ws = min(max(sx + int(np.floor(pw * rw / out)), 0), w)
                we = min(max(sx + int(np.ceil((pw + 1) * rw / out)), 0), w)
                if he <= hs or we <= ws:
                    res[i, ph, pw] = 0.0
                else:
                    res[i, ph, pw] = feat[hs:he, ws:we].max(axis=(0, 1))
    return res


def rand_rois(rs, n, img_h, img_w):
    xy1 = rs.uniform(0, [0.7 * img_w, 0.7 * img_h], size=(n, 2))
    wh = rs.uniform([8, 8], [0.5 * img_w, 0.5 * img_h], size=(n, 2))
    xy2 = np.minimum(xy1 + wh, [img_w, img_h])
    return np.concatenate([xy1, xy2], 1).astype(np.float32)


def test_roi_align_matches_torchvision_semantics():
    rs = np.random.RandomState(0)
    feat = rs.normal(size=(25, 38, 8)).astype(np.float32)
    rois = rand_rois(rs, 17, 600, 400)
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16, roi_chunk=8)
    )
    want = np_roi_align(feat, rois, 1.0 / 16)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_degenerate_and_edge_rois():
    rs = np.random.RandomState(1)
    feat = rs.normal(size=(10, 12, 4)).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 0, 0],  # degenerate -> clamps to min extent 1
            [0, 0, 12 * 16, 10 * 16],  # full image
            [11 * 16, 9 * 16, 12 * 16, 10 * 16],  # bottom-right corner
            [5, 5, 6, 6],  # tiny
        ],
        dtype=np.float32,
    )
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16))
    want = np_roi_align(feat, rois, 1.0 / 16)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_pool_matches_torchvision_semantics():
    rs = np.random.RandomState(2)
    feat = rs.normal(size=(50, 38, 6)).astype(np.float32)
    # Reference passes rois pre-scaled to feature coords, scale=1
    # (models/model.py:106-113); rois must lie within the 50x38 (h, w) map.
    rois = rand_rois(rs, 23, 50, 38)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0, roi_chunk=8))
    want = np_roi_pool(feat, rois, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_roi_pool_degenerate():
    rs = np.random.RandomState(3)
    feat = rs.normal(size=(12, 12, 3)).astype(np.float32)
    rois = np.array([[0, 0, 0.4, 0.4], [11.6, 11.6, 12, 12]], dtype=np.float32)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0))
    want = np_roi_pool(feat, rois, 1.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fpn_level_assignment_golden():
    # canonical: 224^2 -> level 4 -> index 2 for strides (4,8,16,32)
    rois = jnp.array(
        [
            [0, 0, 224, 224],
            [0, 0, 112, 112],  # level 3 -> index 1
            [0, 0, 56, 56],  # level 2 -> index 0
            [0, 0, 448, 448],  # level 5 -> index 3
            [0, 0, 10000, 10000],  # clamped to max
            [0, 0, 4, 4],  # clamped to min
        ],
        dtype=jnp.float32,
    )
    lvl = np.asarray(fpn_level_assignment(rois))
    np.testing.assert_array_equal(lvl, [2, 1, 0, 3, 3, 0])


def test_multiscale_roi_align_selects_levels():
    rs = np.random.RandomState(4)
    feats = [
        rs.normal(size=(56, 56, 4)).astype(np.float32),
        rs.normal(size=(28, 28, 4)).astype(np.float32),
        rs.normal(size=(14, 14, 4)).astype(np.float32),
        rs.normal(size=(7, 7, 4)).astype(np.float32),
    ]
    rois = np.array(
        [[10, 10, 60, 60], [0, 0, 224, 224], [0, 0, 100, 210]], dtype=np.float32
    )
    got = np.asarray(
        multiscale_roi_align(tuple(jnp.asarray(f) for f in feats), jnp.asarray(rois))
    )
    lvls = np.asarray(fpn_level_assignment(jnp.asarray(rois)))
    for i, lvl in enumerate(lvls):
        want = np_roi_align(feats[lvl], rois[i : i + 1], 1.0 / (4 * 2**lvl))
        np.testing.assert_allclose(got[i], want[0], atol=1e-4)


def test_multiscale_gather_matches_dense_fuzz():
    """The gather formulation (default) must agree with the all-levels
    dense-matmul formulation on random scenes, including rois straddling
    level boundaries, degenerate rois, and canvas-edge rois."""
    from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_dense

    rs = np.random.RandomState(11)
    feats = tuple(
        jnp.asarray(rs.normal(size=(s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    for trial in range(5):
        xy1 = rs.uniform(-10, 250, size=(40, 2))
        wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(40, 2)))
        rois = np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)
        rois = np.concatenate(
            [rois, [[5, 5, 5.2, 5.2], [0, 0, 256, 224], [200, 200, 1000, 1000]]]
        ).astype(np.float32)
        got = np.asarray(multiscale_roi_align(feats, jnp.asarray(rois)))
        want = np.asarray(multiscale_roi_align_dense(feats, jnp.asarray(rois)))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_multiscale_pallas_matches_dense_fuzz():
    """Pallas windowed-DMA kernel (interpret mode) vs the dense oracle,
    including extreme aspect ratios that span many window slots and rois
    on levels smaller than one window."""
    from faster_rcnn_pytorch_tpu.ops.pallas.roi_align_kernel import (
        multiscale_roi_align_pallas,
    )
    from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_dense

    rs = np.random.RandomState(19)
    feats = tuple(
        jnp.asarray(rs.normal(size=(s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    xy1 = rs.uniform(-10, 250, size=(40, 2))
    wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(40, 2)))
    rois = np.concatenate([xy1, xy1 + wh], axis=1)
    extremes = np.array(
        [
            [0, 0, 288, 10],      # full-width banner: many x slots at P2
            [0, 0, 10, 256],      # full-height pole: many y slots
            [5, 5, 5.2, 5.2],     # degenerate
            [200, 200, 1000, 1000],  # clamped-level giant
            [0, 0, 288, 256],     # whole canvas
        ]
    )
    rois = jnp.asarray(np.concatenate([rois, extremes]).astype(np.float32))
    got = np.asarray(multiscale_roi_align_pallas(feats, rois, interpret=True))
    want = np.asarray(multiscale_roi_align_dense(feats, rois))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_multiscale_gather_fallback_branch():
    """More than OVERSIZE_K wide rois forces the lax.cond corner-window
    fallback for the whole set; results must still match the oracle."""
    from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_dense

    rs = np.random.RandomState(23)
    feats = tuple(
        jnp.asarray(rs.normal(size=(s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    y = rs.uniform(0, 200, size=(80, 1))
    rois = np.concatenate(
        [np.zeros((80, 1)), y, np.full((80, 1), 280.0), y + 8], axis=1
    )  # 80 full-width banners -> all oversized at their level
    rois = jnp.asarray(rois.astype(np.float32))
    got = np.asarray(multiscale_roi_align(feats, rois))
    want = np.asarray(multiscale_roi_align_dense(feats, rois))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_multiscale_batch_matches_single():
    """The batched entry point (cond outside vmap) must equal per-image
    multiscale_roi_align, including a batch member that forces the
    global corner-window fallback for everyone."""
    from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_batch

    rs = np.random.RandomState(31)
    feats = tuple(
        jnp.asarray(rs.normal(size=(2, s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    xy1 = rs.uniform(-10, 250, size=(2, 90, 2))
    wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(2, 90, 2)))
    rois = np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
    # image 1: mostly full-width banners -> > OVERSIZE_K oversized
    y = rs.uniform(0, 200, size=(80, 1))
    rois[1, :80] = np.concatenate(
        [np.zeros((80, 1)), y, np.full((80, 1), 280.0), y + 8], axis=1
    )
    rois = jnp.asarray(rois)
    got = np.asarray(multiscale_roi_align_batch(feats, rois))
    want = np.stack(
        [
            np.asarray(
                multiscale_roi_align(tuple(f[i] for f in feats), rois[i])
            )
            for i in range(2)
        ]
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_corner_fallback_chunked_exact(monkeypatch):
    """The chunked corner fallback (``FRT_ALIGN_FALLBACK_BUDGET`` bounds
    the lax.cond fallback branch's temporaries — unbounded it OOMs the
    chip at large batch) matches the unchunked vmap to fusion-order
    rounding (the lax.map body compiles separately, so last-ulp f32
    differences are expected), including a chunk size that does not
    divide the roi count."""
    import importlib

    ra = importlib.import_module("faster_rcnn_pytorch_tpu.ops.roi_align")

    rs = np.random.RandomState(53)
    feats = tuple(
        jnp.asarray(rs.normal(size=(2, s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    xy1 = rs.uniform(-10, 250, size=(2, 90, 2))
    wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(2, 90, 2)))
    rois = jnp.asarray(
        np.concatenate([xy1, xy1 + wh], axis=-1).astype(np.float32)
    )
    args = ((4, 8, 16, 32), 7, 2)
    want = np.asarray(
        jax.vmap(lambda f, r: ra._single_corner(f, r, *args))(feats, rois)
    )
    monkeypatch.setenv("FRT_ALIGN_FALLBACK_BUDGET", "500000")
    got = np.asarray(ra._corner_batch_chunked(feats, rois, *args))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_multiscale_grad_matches_dense_grad():
    """The custom VJP (dense-matmul backward) must match autodiff of the
    dense formulation; rois carry zero gradient."""
    import jax

    from faster_rcnn_pytorch_tpu.ops.roi_align import multiscale_roi_align_dense

    rs = np.random.RandomState(41)
    feats = tuple(
        jnp.asarray(rs.normal(size=(s, s + 8, 6)).astype(np.float32))
        for s in (32, 16, 8, 4)
    )
    xy1 = rs.uniform(0, 80, size=(20, 2))
    wh = np.exp(rs.uniform(np.log(4), np.log(120), size=(20, 2)))
    rois = jnp.asarray(np.concatenate([xy1, xy1 + wh], 1).astype(np.float32))
    g = jnp.asarray(rs.normal(size=(20, 7, 7, 6)).astype(np.float32))

    def loss_gather(f):
        return (multiscale_roi_align(f, rois) * g).sum()

    def loss_dense(f):
        return (multiscale_roi_align_dense(f, rois) * g).sum()

    got = jax.grad(loss_gather)(feats)
    want = jax.grad(loss_dense)(feats)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)


def test_dense_folded_matches_dense_fuzz():
    """The folded-bin-weights dense formulation (used by the custom VJPs:
    sub-sample mean + level select folded into the weight rows, halving
    both matmul stages) must equal the sample-resolution dense path."""
    from faster_rcnn_pytorch_tpu.ops.roi_align import (
        _dense_folded,
        multiscale_roi_align_dense,
    )

    rs = np.random.RandomState(7)
    for trial in range(4):
        feats = tuple(
            jnp.asarray(rs.normal(size=(s, s + 4, 5)).astype(np.float32))
            for s in (32, 16, 8, 4)
        )
        n = 24
        xy1 = rs.uniform(-10, 110, size=(n, 2))
        wh = np.exp(rs.uniform(np.log(2), np.log(160), size=(n, 2)))
        rois = jnp.asarray(np.concatenate([xy1, xy1 + wh], 1).astype(np.float32))
        got = np.asarray(_dense_folded(feats, rois))
        want = np.asarray(multiscale_roi_align_dense(feats, rois))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_roi_window_kernel_matches_dense_fuzz():
    """v2 per-roi window-DMA kernel (interpret mode), composed with its
    compacted corner fallback, vs the dense oracle — including extreme
    aspect ratios that overflow the window and clamped-level giants."""
    from faster_rcnn_pytorch_tpu.ops.roi_align import (
        _batch_window_kernel,
        multiscale_roi_align_dense,
    )

    rs = np.random.RandomState(31)
    feats = tuple(
        jnp.asarray(rs.normal(size=(2, s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    rois_imgs = []
    for _ in range(2):
        xy1 = rs.uniform(-10, 250, size=(40, 2))
        wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(40, 2)))
        r = np.concatenate([xy1, xy1 + wh], axis=1)
        extremes = np.array(
            [
                [0, 0, 288, 10],       # full-width banner: overflows win_x
                [0, 0, 10, 256],       # full-height pole: overflows win_y
                [5, 5, 5.2, 5.2],      # degenerate
                [200, 200, 1000, 1000],  # clamped-level giant
                [0, 0, 288, 256],      # whole canvas
            ]
        )
        rois_imgs.append(np.concatenate([r, extremes]))
    rois = jnp.asarray(np.stack(rois_imgs).astype(np.float32))
    got = np.asarray(
        _batch_window_kernel(feats, rois, (4, 8, 16, 32), 7, 2, interpret=True)
    )
    want = np.asarray(
        jax.vmap(lambda f, r: multiscale_roi_align_dense(f, r))(feats, rois)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_roi_window_bwd_kernel_matches_dense_vjp_fuzz():
    """Scatter-accumulate backward kernel (interpret mode) vs the
    autodiff VJP of the dense oracle, gradients of non-fitting rois
    zeroed on both sides — includes overlap-heavy clustered rois that
    exercise the RMW hazard path."""
    from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
        roi_window_align_bwd,
    )
    from faster_rcnn_pytorch_tpu.ops.roi_align import (
        multiscale_roi_align_dense,
    )

    rs = np.random.RandomState(7)
    feats = tuple(
        jnp.asarray(rs.normal(size=(2, s, s + 8, 6)).astype(np.float32))
        for s in (64, 32, 16, 8)
    )
    level_dims = tuple((f.shape[1], f.shape[2]) for f in feats)
    rois_imgs = []
    for _ in range(2):
        xy1 = rs.uniform(-10, 250, size=(28, 2))
        wh = np.exp(rs.uniform(np.log(2), np.log(500), size=(28, 2)))
        r = np.concatenate([xy1, xy1 + wh], axis=1)
        # Clustered near-identical rois: consecutive windows overlap.
        clump = np.tile(np.array([[40.0, 40.0, 120.0, 120.0]]), (8, 1))
        clump += rs.uniform(-3, 3, size=clump.shape)
        extremes = np.array(
            [
                [0, 0, 288, 10],
                [0, 0, 10, 256],
                [200, 200, 1000, 1000],
                [0, 0, 288, 256],
            ]
        )
        rois_imgs.append(np.concatenate([r, clump, extremes]))
    rois = jnp.asarray(np.stack(rois_imgs).astype(np.float32))
    b, n = rois.shape[:2]
    g = jnp.asarray(rs.normal(size=(b, n, 7, 7, 6)).astype(np.float32))

    dfs, fits = roi_window_align_bwd(
        g, rois, level_dims, interpret=True
    )
    gz = g * fits[..., None, None, None].astype(g.dtype)

    # Odd total roi count: the interleaved ordering's split is uneven.
    dfs_odd, fits_odd = roi_window_align_bwd(
        g[:1, :13], rois[:1, :13], level_dims, interpret=True
    )
    gz_odd = g[:1, :13] * fits_odd[..., None, None, None].astype(g.dtype)
    _, vjp_odd = jax.vjp(
        lambda f: jax.vmap(lambda f2, r: multiscale_roi_align_dense(f2, r))(
            f, rois[:1, :13]
        ),
        tuple(f[:1] for f in feats),
    )
    (want_odd,) = vjp_odd(gz_odd)
    for got_l, want_l in zip(dfs_odd, want_odd):
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(want_l), atol=2e-4, rtol=1e-4
        )
    _, vjp = jax.vjp(
        lambda f: jax.vmap(lambda f2, r: multiscale_roi_align_dense(f2, r))(
            f, rois
        ),
        feats,
    )
    (want,) = vjp(gz)
    assert bool(fits.sum()) > 0 and bool((~fits).sum()) > 0
    for got_l, want_l in zip(dfs, want):
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(want_l), atol=2e-4, rtol=1e-4
        )


def test_msra_batch_vjp_kernel_composition():
    """Full custom-VJP wiring (kernel + compacted dense fallback for
    non-fitting rois) through FRT_ALIGN_KERNEL=interpret, vs the dense
    VJP — lane-aligned channels so the kernel gate passes."""
    import os

    import importlib

    ra = importlib.import_module("faster_rcnn_pytorch_tpu.ops.roi_align")

    rs = np.random.RandomState(11)
    feats = tuple(
        jnp.asarray(rs.normal(size=(1, s, s, 128)).astype(np.float32) * 0.1)
        for s in (32, 16, 8, 4)
    )
    strides = (4, 8, 16, 32)
    xy1 = rs.uniform(0, 80, size=(10, 2))
    wh = np.exp(rs.uniform(np.log(4), np.log(120), size=(10, 2)))
    r = np.concatenate([xy1, xy1 + wh], axis=1)
    extremes = np.array([[0, 0, 127, 6], [0, 0, 900, 900]])
    rois = jnp.asarray(
        np.concatenate([r, extremes])[None].astype(np.float32)
    )
    g = jnp.asarray(
        rs.normal(size=(1, 12, 7, 7, 128)).astype(np.float32)
    )

    def run():
        _, vjp = jax.vjp(
            lambda f: ra.multiscale_roi_align_batch(f, rois, strides, 7, 2),
            feats,
        )
        return vjp(g)[0]

    old = os.environ.get("FRT_ALIGN_KERNEL")
    os.environ["FRT_ALIGN_KERNEL"] = "interpret"
    try:
        got = run()
    finally:
        if old is None:
            os.environ.pop("FRT_ALIGN_KERNEL", None)
        else:
            os.environ["FRT_ALIGN_KERNEL"] = old

    _, vjp = jax.vjp(
        lambda f: jax.vmap(
            lambda f2, r2: ra.multiscale_roi_align_dense(f2, r2, strides)
        )(f, rois),
        feats,
    )
    (want,) = vjp(g)
    for got_l, want_l in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(got_l), np.asarray(want_l), atol=3e-4, rtol=2e-4
        )


def test_roi_window_geometry_fits():
    """fits must be False exactly for rois whose footprint exceeds the
    window at their assigned level, True for compact rois."""
    from faster_rcnn_pytorch_tpu.ops.pallas.roi_window_kernel import (
        roi_window_geometry,
        window_dims,
        _round8,
    )

    level_dims = ((64, 72), (32, 40), (16, 24), (8, 16))
    win_y, win_x = window_dims(level_dims)
    w_pad = max(_round8(72) + 8, win_x)
    rois = jnp.asarray(
        np.array(
            [
                [10, 10, 60, 60],    # compact
                [0, 0, 288, 10],     # extreme banner at P2
                [0, 0, 10, 256],     # extreme pole
                [30, 40, 80, 90],    # compact
            ],
            dtype=np.float32,
        )
    )
    *_, fits = roi_window_geometry(
        rois, level_dims, (4, 8, 16, 32), 7, 2, win_y, win_x, w_pad
    )
    np.testing.assert_array_equal(
        np.asarray(fits), [True, False, False, True]
    )
