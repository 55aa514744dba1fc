"""Slab-batched VGG stem: exactness vs the plain conv stack.

The stem transform (models/vgg.py `_slab_stage`) must be numerically a
no-op: identical params, identical outputs and gradients up to float
accumulation order. These tests pin that at several (batch, height)
combinations, including the out-of-image halo masking that makes interior
SAME zero-padding exact, and the fallback when the height doesn't divide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.flatten_util import ravel_pytree

from faster_rcnn_pytorch_tpu.models import vgg
from faster_rcnn_pytorch_tpu.models.vgg import VGG16Features, _slab_factor


def _init(batch, h, w, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.normal(size=(batch, h, w, 3)).astype(np.float32))
    model = VGG16Features(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x)
    return model, params, x


def _apply(model, params, x, slab_on, monkeypatch):
    monkeypatch.setenv("FRT_SLAB_STEM", "1" if slab_on else "0")
    return model.apply(params, x, True)  # train=True: slab engages there


@pytest.mark.parametrize("batch,h,w", [(1, 64, 96), (2, 64, 64), (4, 32, 48)])
def test_slab_stem_forward_exact(batch, h, w, monkeypatch):
    model, params, x = _init(batch, h, w)
    plain = _apply(model, params, x, False, monkeypatch)
    slab = _apply(model, params, x, True, monkeypatch)
    assert _slab_factor(batch, h, train=True) > 1  # slab actually engaged
    np.testing.assert_allclose(
        np.asarray(slab), np.asarray(plain), rtol=1e-5, atol=1e-5
    )


def test_slab_stem_gradient_exact(monkeypatch):
    model, params, x = _init(2, 64, 64)

    def loss(p, on):
        monkeypatch.setenv("FRT_SLAB_STEM", "1" if on else "0")
        return (model.apply(p, x, True) ** 2).sum()

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_slab = jax.grad(lambda p: loss(p, True))(params)
    flat_p, _ = ravel_pytree(g_plain)
    flat_s, _ = ravel_pytree(g_slab)
    scale = float(jnp.abs(flat_p).max())
    np.testing.assert_allclose(
        np.asarray(flat_s), np.asarray(flat_p), rtol=1e-4, atol=1e-4 * scale
    )


def test_slab_factor_fallbacks(monkeypatch):
    monkeypatch.setenv("FRT_SLAB_STEM", "1")
    assert _slab_factor(8, 64, True) == 1  # batch already at target
    assert _slab_factor(1, 50, True) == 1  # 50 % 8 != 0
    assert _slab_factor(4, 18, True) == 1  # slab height 9 odd (pool misaligns)
    assert _slab_factor(4, 64, True) == 2
    assert _slab_factor(1, 64, True) == 8
    assert _slab_factor(1, 64, False) == 1  # predict path stays plain
    monkeypatch.setenv("FRT_SLAB_STEM", "always")
    assert _slab_factor(1, 64, False) == 8  # unless opted in
    monkeypatch.setenv("FRT_SLAB_STEM", "0")
    assert _slab_factor(1, 64, True) == 1
    monkeypatch.delenv("FRT_SLAB_STEM")
    monkeypatch.setenv("FRT_SLAB_TARGET", "16")
    assert _slab_factor(2, 64, True) == 8


def test_slab_param_tree_unchanged(monkeypatch):
    """Slab on/off must produce the identical param structure (checkpoint
    compatibility both ways)."""
    model, params_plain, x = _init(2, 64, 64)
    monkeypatch.setenv("FRT_SLAB_STEM", "0")
    params_off = VGG16Features(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), x
    )
    t1 = jax.tree_util.tree_structure(params_plain)
    t2 = jax.tree_util.tree_structure(params_off)
    assert t1 == t2
    for a, b in zip(
        jax.tree_util.tree_leaves(params_plain),
        jax.tree_util.tree_leaves(params_off),
    ):
        assert a.shape == b.shape
