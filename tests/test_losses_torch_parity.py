"""Loss numerics vs torch (the reference's loss stack is torch,
losses/loss.py:5-85): masked CE == CrossEntropyLoss(ignore_index=-1),
smooth-L1 == the reference's elementwise form, and the composite RPN/RoI
losses match the reference normalisations."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as nn

from faster_rcnn_pytorch_tpu.models.losses import (
    frcnn_loss,
    masked_cross_entropy,
    roi_loss,
    rpn_loss,
    smooth_l1,
)


def test_masked_ce_matches_torch_ignore_index():
    rs = np.random.RandomState(0)
    logits = rs.normal(size=(50, 7)).astype(np.float32)
    labels = rs.randint(-1, 7, size=50).astype(np.int32)
    want = nn.CrossEntropyLoss(ignore_index=-1)(
        torch.from_numpy(logits), torch.from_numpy(labels).long()
    ).item()
    got = float(masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_l1_matches_reference_form():
    rs = np.random.RandomState(1)
    pred = rs.normal(size=(30, 4)).astype(np.float32)
    target = rs.normal(size=(30, 4)).astype(np.float32)
    for beta in (1.0, 1.0 / 9.0):
        x = torch.from_numpy(np.abs(pred - target))
        want = torch.where(x >= beta, x - 0.5 * beta, 0.5 * x**2 / beta).numpy()
        got = np.asarray(smooth_l1(jnp.asarray(pred), jnp.asarray(target), beta))
        np.testing.assert_allclose(got, want, atol=1e-6)


def _torch_rpn_loss(pred_cls, pred_reg, tg_cls, tg_reg, beta=1 / 9):
    """Reference RPNLoss.forward (losses/loss.py:24-40)."""
    ce = nn.CrossEntropyLoss(ignore_index=-1)(
        torch.from_numpy(pred_cls), torch.from_numpy(tg_cls).long()
    )
    pos = tg_cls > 0
    x = torch.from_numpy(np.abs(pred_reg[pos] - tg_reg[pos]))
    sl1 = torch.where(x >= beta, x - 0.5 * beta, 0.5 * x**2 / beta)
    reg = sl1.sum() / (tg_cls >= 0).sum()
    return ce.item(), reg.item()


def test_rpn_loss_matches_reference():
    rs = np.random.RandomState(2)
    a = 200
    pred_cls = rs.normal(size=(a, 2)).astype(np.float32)
    pred_reg = rs.normal(size=(a, 4)).astype(np.float32)
    tg_cls = rs.choice([-1, 0, 1], size=a, p=[0.7, 0.2, 0.1]).astype(np.int32)
    tg_reg = rs.normal(size=(a, 4)).astype(np.float32)
    tg_reg[tg_cls != 1] = 0.0
    want_c, want_r = _torch_rpn_loss(pred_cls, pred_reg, tg_cls, tg_reg)
    got_c, got_r = rpn_loss(
        jnp.asarray(pred_cls), jnp.asarray(pred_reg),
        jnp.asarray(tg_cls), jnp.asarray(tg_reg),
    )
    np.testing.assert_allclose(float(got_c), want_c, rtol=1e-5)
    np.testing.assert_allclose(float(got_r), want_r, rtol=1e-5)


def test_roi_loss_matches_reference():
    rs = np.random.RandomState(3)
    s, c = 128, 21
    pred_cls = rs.normal(size=(s, c)).astype(np.float32)
    pred_reg = rs.normal(size=(s, 4)).astype(np.float32)
    tg_cls = rs.randint(0, c, size=s).astype(np.int32)
    tg_reg = rs.normal(size=(s, 4)).astype(np.float32)
    tg_reg[tg_cls == 0] = 0.0

    ce = nn.CrossEntropyLoss()(
        torch.from_numpy(pred_cls), torch.from_numpy(tg_cls).long()
    ).item()
    pos = tg_cls > 0
    x = torch.from_numpy(np.abs(pred_reg[pos] - tg_reg[pos]))
    sl1 = torch.where(x >= 1.0, x - 0.5, 0.5 * x**2)
    reg = (sl1.sum() / s).item()

    got_c, got_r = roi_loss(
        jnp.asarray(pred_cls), jnp.asarray(pred_reg),
        jnp.asarray(tg_cls), jnp.asarray(tg_reg),
    )
    np.testing.assert_allclose(float(got_c), ce, rtol=1e-5)
    np.testing.assert_allclose(float(got_r), reg, rtol=1e-5)


def test_total_is_unweighted_sum():
    rs = np.random.RandomState(4)
    pred = (
        rs.normal(size=(1, 50, 2)).astype(np.float32),
        rs.normal(size=(1, 50, 4)).astype(np.float32),
        rs.normal(size=(1, 16, 5)).astype(np.float32),
        rs.normal(size=(1, 16, 4)).astype(np.float32),
    )
    target = (
        rs.choice([-1, 0, 1], size=(1, 50)).astype(np.int32),
        rs.normal(size=(1, 50, 4)).astype(np.float32),
        rs.randint(0, 5, size=(1, 16)).astype(np.int32),
        rs.normal(size=(1, 16, 4)).astype(np.float32),
    )
    out = frcnn_loss(tuple(map(jnp.asarray, pred)), tuple(map(jnp.asarray, target)))
    np.testing.assert_allclose(
        float(out.total),
        float(out.rpn_cls + out.rpn_reg + out.roi_cls + out.roi_reg),
        rtol=1e-6,
    )
