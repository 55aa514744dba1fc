"""Serving export (serving.py / export.py): AOT artifacts round-trip."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
    FPN_CONFIG,
    LEGACY_CONFIG,
    build_model,
    init_detector_params,
)
from faster_rcnn_pytorch_tpu.serving import (
    artifact_name,
    export_predict,
    load_artifact,
    make_serving_fn,
    save_artifact,
)

CANVAS = 64
TINY = dataclasses.replace(
    LEGACY_CONFIG,
    num_classes=6,
    pre_nms_train=64,
    post_nms_train=16,
    pre_nms_test=32,
    post_nms_test=8,
    roi_samples=8,
    roi_pos_quota=2,
    max_detections=8,
)


def _tiny_model_params():
    model, _ = build_model("legacy", num_classes=6, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=CANVAS)
    return model, params


@pytest.mark.slow
def test_export_artifact_matches_direct_predict(tmp_path):
    """Serialize -> load -> call must equal the live jitted predict
    bit-for-bit (same program, params baked as constants)."""
    model, params = _tiny_model_params()
    rs = np.random.RandomState(3)
    images = jnp.asarray(rs.normal(size=(2, CANVAS, CANVAS, 3)).astype(np.float32))
    extents = jnp.asarray([[1.0, 1.0], [0.8, 0.9]], jnp.float32)

    want = make_serving_fn(model, TINY, params)(images, extents)

    exp = export_predict(model, TINY, params, (CANVAS, CANVAS), batch=2)
    path = os.path.join(tmp_path, artifact_name((CANVAS, CANVAS), 2))
    save_artifact(exp, path)
    assert os.path.exists(path) and os.path.getsize(path) > 0

    call = load_artifact(path)
    got = call(images, extents)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.shape == (2, TINY.max_detections, 7)


@pytest.mark.slow
def test_fpn_export_artifact_matches_direct_predict(tmp_path):
    """FPN-generation twin: the export path is generation-agnostic; this
    pins the ResNet50-FPN predict (multi-level anchors, MultiScale
    align, 91-class _suppress shape) through serialize -> load -> call
    against the live jitted predict bit-for-bit."""
    tiny = dataclasses.replace(
        FPN_CONFIG,
        num_classes=7,
        pre_nms_train=64,
        post_nms_train=16,
        pre_nms_test=32,
        post_nms_test=8,
        roi_samples=8,
        roi_pos_quota=2,
        max_detections=8,
    )
    model, _ = build_model("fpn", num_classes=7, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(1), canvas=CANVAS)
    rs = np.random.RandomState(5)
    images = jnp.asarray(
        rs.normal(size=(1, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.asarray([[0.9, 1.0]], jnp.float32)

    want = make_serving_fn(model, tiny, params)(images, extents)

    exp = export_predict(model, tiny, params, (CANVAS, CANVAS), batch=1)
    path = os.path.join(tmp_path, artifact_name((CANVAS, CANVAS), 1))
    save_artifact(exp, path)
    got = load_artifact(path)(images, extents)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert got.shape == (1, tiny.max_detections, 7)


def test_export_rejects_wrong_shape(tmp_path):
    """The artifact is shape-specialized: a wrong canvas must raise, not
    silently mis-predict."""
    model, params = _tiny_model_params()
    exp = export_predict(model, TINY, params, (CANVAS, CANVAS), batch=1)
    path = os.path.join(tmp_path, "a.jaxexp")
    save_artifact(exp, path)
    call = load_artifact(path)
    bad = jnp.zeros((1, CANVAS, CANVAS + 16, 3), jnp.float32)
    with pytest.raises(ValueError):
        call(bad, jnp.ones((1, 2), jnp.float32))


@pytest.mark.slow
def test_exported_detector_routes_by_shape(tmp_path):
    """ExportedDetector picks the artifact matching the input bucket and
    rejects unknown shapes."""
    from faster_rcnn_pytorch_tpu.serving import ExportedDetector, write_manifest

    model, params = _tiny_model_params()
    entries = []
    for canvas in [(CANVAS, CANVAS), (CANVAS, CANVAS + 16)]:
        exp = export_predict(model, TINY, params, canvas, batch=1)
        fname = artifact_name(canvas, 1)
        save_artifact(exp, os.path.join(tmp_path, fname))
        entries.append({"file": fname, "canvas_hw": list(canvas), "batch": 1})
    write_manifest(str(tmp_path), entries)

    det = ExportedDetector(str(tmp_path))
    assert det.buckets() == [
        (1, (CANVAS, CANVAS)),
        (1, (CANVAS, CANVAS + 16)),
    ]
    ext = jnp.ones((1, 2), jnp.float32)
    for canvas in [(CANVAS, CANVAS), (CANVAS, CANVAS + 16)]:
        packed = det(jnp.zeros((1, *canvas, 3), jnp.float32), ext)
        assert packed.shape == (1, TINY.max_detections, 7)
    with pytest.raises(ValueError, match="no artifact"):
        det(jnp.zeros((1, CANVAS + 32, CANVAS, 3), jnp.float32), ext)


@pytest.mark.slow
def test_params_sidecar_artifact_matches_baked(tmp_path):
    """params-as-args export: the StableHLO body carries no weights (a
    fraction of the baked artifact's bytes — the property that keeps
    the 274 MB legacy program under remote_compile HTTP limits,
    DESIGN.md §6), the sidecar round-trips through ExportedDetector,
    and the outputs are bit-equal to the baked artifact's."""
    from faster_rcnn_pytorch_tpu.serving import (
        PARAMS_SIDECAR,
        ExportedDetector,
        save_params_sidecar,
        write_manifest,
    )

    model, params = _tiny_model_params()
    rs = np.random.RandomState(7)
    images = jnp.asarray(
        rs.normal(size=(1, CANVAS, CANVAS, 3)).astype(np.float32)
    )
    extents = jnp.asarray([[1.0, 0.9]], jnp.float32)

    baked = export_predict(model, TINY, params, (CANVAS, CANVAS), batch=1)
    baked_path = os.path.join(tmp_path, "baked.jaxexp")
    save_artifact(baked, baked_path)
    want = load_artifact(baked_path)(images, extents)

    side = export_predict(
        model, TINY, params, (CANVAS, CANVAS), batch=1, params_as_args=True
    )
    fname = artifact_name((CANVAS, CANVAS), 1)
    side_path = os.path.join(tmp_path, fname)
    save_artifact(side, side_path)
    save_params_sidecar(model, params, os.path.join(tmp_path, PARAMS_SIDECAR))
    # Weights out of the program body: the argument-style artifact must
    # be far smaller than the constant-baked one.
    assert os.path.getsize(side_path) < 0.5 * os.path.getsize(baked_path)

    write_manifest(
        str(tmp_path),
        [
            {
                "file": fname,
                "canvas_hw": [CANVAS, CANVAS],
                "batch": 1,
                "params_as_args": True,
            }
        ],
        extra={"params_file": PARAMS_SIDECAR},
    )
    det = ExportedDetector(str(tmp_path))
    got = det(images, extents)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_manifest_merge_keeps_prior_entries(tmp_path):
    """Re-exporting into the same directory must not orphan earlier
    artifacts from the manifest."""
    from faster_rcnn_pytorch_tpu.serving import write_manifest

    write_manifest(str(tmp_path), [{"file": "a.jaxexp", "canvas_hw": [64, 64], "batch": 1}])
    write_manifest(str(tmp_path), [{"file": "b.jaxexp", "canvas_hw": [64, 64], "batch": 8}])
    # same file re-exported: replaced, not duplicated
    write_manifest(str(tmp_path), [{"file": "a.jaxexp", "canvas_hw": [64, 64], "batch": 1}])
    with open(os.path.join(tmp_path, "manifest.json")) as f:
        arts = json.load(f)["artifacts"]
    assert sorted(e["file"] for e in arts) == ["a.jaxexp", "b.jaxexp"]


@pytest.mark.slow
def test_export_cli_writes_artifacts_and_manifest(tmp_path):
    """CLI end-to-end: fresh params (no checkpoint on disk), both
    orientation buckets exported, manifest describes them."""
    from faster_rcnn_pytorch_tpu.export import main

    out = os.path.join(tmp_path, "export")
    rc = main(
        [
            "--data_type", "voc",
            "--resize", "64",
            "--max_size", "96",
            "--batch_size", "1",
            "--dtype", "float32",
            "--log_dir", os.path.join(tmp_path, "logs"),
            "--export_dir", out,
        ]
    )
    assert rc == 0
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["artifacts"]) == 2  # landscape + portrait
    for e in manifest["artifacts"]:
        p = os.path.join(out, e["file"])
        assert os.path.getsize(p) > 0
        call = load_artifact(p)
        h, w = e["canvas_hw"]
        packed = call(
            jnp.zeros((1, h, w, 3), jnp.float32),
            jnp.ones((1, 2), jnp.float32),
        )
        assert packed.shape[0] == 1 and packed.shape[2] == 7
    assert manifest["num_classes"] == 21
