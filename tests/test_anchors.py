"""Anchor generation parity: golden values from the reference formulas
(anchor.py:15-55) and torchvision's AnchorGenerator."""

import numpy as np

from faster_rcnn_pytorch_tpu.models import anchors as A


def test_legacy_base_golden():
    base = A.legacy_anchor_base()
    assert base.shape == (9, 4)
    # Classic py-faster-rcnn values for ratio=0.5, scale=8 at base 16
    # centered (8, 8): w = 128*sqrt(.5)=90.51, h = 128*sqrt(2)=181.02.
    np.testing.assert_allclose(
        base[0], [8 - 90.50967 / 2, 8 - 181.01933 / 2, 8 + 90.50967 / 2, 8 + 181.01933 / 2],
        atol=1e-4,
    )
    # ratio=1, scale=16 -> square 256: [-120, -120, 136, 136]
    np.testing.assert_allclose(base[4], [-120, -120, 136, 136], atol=1e-4)
    # widths always positive, ordering ratio-major scale-minor
    w = base[:, 2] - base[:, 0]
    np.testing.assert_allclose(w[3:6] / 16, [8, 16, 32], atol=1e-4)


def test_legacy_shifted_count_and_norm():
    anc = A.legacy_anchors(800, 800)
    assert anc.shape == (50 * 50 * 9, 4)
    # First anchor = base[0] / 800.
    np.testing.assert_allclose(anc[0] * 800, A.legacy_anchor_base()[0], atol=1e-4)
    # y-major ordering: anchor block at position (row=1, col=0) is shifted
    # by 16px in y only.
    k = 50 * 9  # one full row of positions
    np.testing.assert_allclose(
        (anc[k] - anc[0]) * 800, [0, 16, 0, 16], atol=1e-4
    )
    # x-minor ordering: next position block shifts 16px in x.
    np.testing.assert_allclose((anc[9] - anc[0]) * 800, [16, 0, 16, 0], atol=1e-4)


def test_legacy_nonsquare():
    anc = A.legacy_anchors(800, 1344)
    assert anc.shape == (50 * 84 * 9, 4)
    assert A.num_legacy_anchors(800, 1344) == anc.shape[0]


def test_fpn_cell_anchors_golden():
    # torchvision rounds: size 32, ratio 0.5 -> w = 32/sqrt(.5)=45.25 ->
    # base [-23, -11, 23, 11] after round(±22.63, ±11.31).
    base = A.fpn_cell_anchors(32)
    np.testing.assert_allclose(base[0], [-23, -11, 23, 11])
    np.testing.assert_allclose(base[1], [-16, -16, 16, 16])
    np.testing.assert_allclose(base[2], [-11, -23, 11, 23])


def test_fpn_anchor_count():
    anc = A.fpn_anchors(800, 800)
    want = sum(3 * (-(-800 // s)) ** 2 for s in (4, 8, 16, 32, 64))
    assert anc.shape == (want, 4)
    assert A.num_fpn_anchors(800, 800) == want
    # First level-0 anchor sits at grid origin: base/800.
    np.testing.assert_allclose(anc[0] * 800, [-23, -11, 23, 11], atol=1e-4)


def test_anchors_cached():
    a1 = A.legacy_anchors(800, 800)
    a2 = A.legacy_anchors(800, 800)
    assert a1 is a2


def test_inside_fraction_small_canvas_starves_legacy():
    # The diagnosed shapes-COCO failure mode: at a 160x256 canvas with a
    # square image (extent 0.625 x 1.0), 128-512px legacy anchors are
    # almost all boundary-filtered -> main.py preflight must warn.
    anc = A.legacy_anchors(160, 256)
    starved = A.inside_fraction(anc, (160 / 256, 1.0))
    assert starved < 0.01
    # The proven 320px recipe keeps a healthy eligible pool.
    anc = A.legacy_anchors(320, 512)
    assert A.inside_fraction(anc, (320 / 512, 1.0)) > 0.02
    # FPN's 32px anchors are fine even on the small canvas.
    fanc = A.fpn_anchors(160, 256)
    assert A.inside_fraction(fanc, (160 / 256, 1.0)) > 0.10


def test_inside_fraction_matches_boundary_predicate():
    anc = A.legacy_anchors(320, 512)
    ex, ey = 0.7, 0.9
    inside = (
        (anc[:, 0] >= 0)
        & (anc[:, 1] >= 0)
        & (anc[:, 2] <= ex)
        & (anc[:, 3] <= ey)
    )
    assert A.inside_fraction(anc, (ex, ey)) == inside.mean()
