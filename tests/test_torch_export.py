"""Reverse checkpoint migration: params -> reference-layout torch state
dicts (utils/checkpoint.py export_*), the inverse of the importers.

Round-trip law: ``import(export(params)) == params`` bit-exact for every
leaf (all conversions are pure transposes/reshapes). The strict-load
direction against the ACTUAL reference models lives in
test_reference_parity.py (needs the reference mounted).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.utils.checkpoint import (
    export_fpn_torch_state_dict,
    export_legacy_torch_state_dict,
    import_fpn_torch_params,
    import_legacy_torch_params,
    load_torch_state_dict,
    save_torch_checkpoint,
)

CANVAS = 64


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        other = fb[path]
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(other), err_msg=str(path)
        )


@pytest.fixture(scope="module")
def legacy_params():
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    return init_detector_params(model, jax.random.key(0), canvas=CANVAS)


@pytest.fixture(scope="module")
def fpn_params():
    model, _ = build_model("fpn", num_classes=6, dtype=jnp.float32)
    return init_detector_params(model, jax.random.key(1), canvas=CANVAS)


@pytest.mark.slow
def test_legacy_roundtrip_bit_exact(legacy_params):
    sd = export_legacy_torch_state_dict(legacy_params)
    back = import_legacy_torch_params(sd, num_classes=6)
    _assert_trees_equal(legacy_params["params"], back["params"])


def test_legacy_export_aliases_shared_classifier(legacy_params):
    """The reference registers the shared VGG classifier under both
    ``classifier.*`` and ``fast_rcnn_head.classifier.*``
    (models/model.py:282-298); both aliases must be present and equal
    for a strict load."""
    sd = export_legacy_torch_state_dict(legacy_params)
    for idx in (0, 2):
        for leaf in ("weight", "bias"):
            a = sd[f"classifier.{idx}.{leaf}"]
            b = sd[f"fast_rcnn_head.classifier.{idx}.{leaf}"]
            np.testing.assert_array_equal(a, b)


def test_fpn_roundtrip_bit_exact(fpn_params):
    sd = export_fpn_torch_state_dict(fpn_params)
    back = import_fpn_torch_params(sd, num_classes=6)
    _assert_trees_equal(fpn_params["params"], back["params"])


def test_fpn_export_has_bn_buffers(fpn_params):
    """torch BatchNorm strict loads need running stats AND the
    num_batches_tracked buffer for every BN module."""
    sd = export_fpn_torch_state_dict(fpn_params)
    bn_prefixes = {
        k.rsplit(".", 1)[0] for k in sd if k.endswith(".running_mean")
    }
    assert bn_prefixes  # conv1 bn + 16 bottlenecks' bns + downsamples
    for p in bn_prefixes:
        for leaf in ("weight", "bias", "running_mean", "running_var",
                     "num_batches_tracked"):
            assert f"{p}.{leaf}" in sd, f"{p}.{leaf}"
        assert sd[f"{p}.num_batches_tracked"].dtype == np.int64


@pytest.mark.slow
@pytest.mark.parametrize("generation", ["legacy", "fpn"])
def test_save_torch_checkpoint_blob_roundtrip(
    tmp_path, generation, legacy_params, fpn_params
):
    """save_torch_checkpoint writes the reference's train.py:78-85 blob
    ({'epoch', 'model_state_dict'}), readable back through the normal
    torch-import path."""
    params = legacy_params if generation == "legacy" else fpn_params
    path = str(tmp_path / f"{generation}.pth.tar")
    save_torch_checkpoint(path, params, generation, epoch=7)

    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7
    assert isinstance(blob["model_state_dict"], dict)

    sd = load_torch_state_dict(path)
    importer = (
        import_legacy_torch_params
        if generation == "legacy"
        else import_fpn_torch_params
    )
    back = importer(sd, num_classes=6)
    _assert_trees_equal(params["params"], back["params"])
