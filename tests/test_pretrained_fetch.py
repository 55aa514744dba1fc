"""Released-weights registry / gated downloader (utils/pretrained.py).

Counterpart of the reference's download_url_pretrained.py + the implicit
torchvision pretrained=True fetches. All tests run offline: the cache-hit
path needs no network, and failure paths are driven with file:// URLs.
"""

import os

import pytest
import torch

from faster_rcnn_pytorch_tpu.utils import pretrained as pt


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("FRT_CACHE_DIR", str(tmp_path))
    return tmp_path / "checkpoints"


def test_cache_dir_env_override(cache):
    assert pt.cache_dir() == str(cache)


def test_fetch_reuses_existing_file(cache):
    cache.mkdir(parents=True)
    staged = cache / pt.CHECKPOINTS["vgg16"][1]
    staged.write_bytes(b"weights")
    assert pt.fetch("vgg16") == str(staged)
    assert staged.read_bytes() == b"weights"  # untouched


def test_fetch_unknown_name():
    with pytest.raises(KeyError, match="unknown pretrained artifact"):
        pt.fetch("nope")


def test_fetch_failure_names_url_and_dest(cache, monkeypatch):
    # file:// to a nonexistent path fails fast and deterministically
    # (no network dependence), exercising the egress-less error path.
    monkeypatch.setitem(
        pt.CHECKPOINTS, "vgg16", ("file:///nonexistent/x.pth", "x.pth")
    )
    with pytest.raises(RuntimeError, match="stage the file manually"):
        pt.fetch("vgg16")
    assert not os.path.exists(cache / "x.pth.part")  # no truncated leftover


def test_fetch_downloads_via_url(cache, tmp_path):
    src = tmp_path / "src.pth"
    src.write_bytes(b"payload")
    pt.CHECKPOINTS["_test"] = (f"file://{src}", "dl.pth")
    try:
        dest = pt.fetch("_test")
    finally:
        del pt.CHECKPOINTS["_test"]
    assert open(dest, "rb").read() == b"payload"


def test_resolve_backbone_path_passthrough(tmp_path):
    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    assert pt.resolve_backbone(str(p), "legacy") == str(p)


@pytest.mark.parametrize(
    "spec,generation,name",
    [
        ("auto", "legacy", "vgg16"),
        ("imagenet", "fpn", "resnet50"),
        ("vgg16", "fpn", "vgg16"),  # explicit registry name wins
    ],
)
def test_resolve_backbone_specs(cache, spec, generation, name):
    cache.mkdir(parents=True)
    staged = cache / pt.CHECKPOINTS[name][1]
    staged.write_bytes(b"w")
    assert pt.resolve_backbone(spec, generation) == str(staged)


def test_resolve_backbone_typo_raises():
    with pytest.raises(ValueError, match="not a file"):
        pt.resolve_backbone("/no/such/weights.pth", "legacy")


def test_checkpoint_pretrained_sentinel(cache):
    """--checkpoint pretrained fetches the released demo detector and
    imports it (reference models/model_.py:300-312 pretrained=True).
    Staged offline via the reverse exporter's .pth.tar round-trip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from faster_rcnn_pytorch_tpu.config import Options
    from faster_rcnn_pytorch_tpu.main import init_params
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils import checkpoint as ck

    model, _ = build_model("legacy", num_classes=21, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    cache.mkdir(parents=True)
    ck.save_torch_checkpoint(
        str(cache / pt.CHECKPOINTS["frcnn_demo"][1]), params, "legacy"
    )

    opts = Options(checkpoint="pretrained", num_classes=21)
    out = init_params(model, opts)
    assert opts.checkpoint.endswith("frcnn.best.pth.tar")
    np.testing.assert_allclose(
        np.asarray(out["params"]["cls_head"]["kernel"]),
        np.asarray(params["params"]["cls_head"]["kernel"]),
        atol=1e-6,
    )


def test_load_pretrained_backbone_accepts_auto_spec(cache, monkeypatch):
    """--pretrained_backbone auto end-to-end: the staged vgg16 file in
    the cache feeds the ImageNet importer exactly like an explicit path
    (reference: vgg16(pretrained=True), models/model.py:275-281)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from faster_rcnn_pytorch_tpu.models.faster_rcnn import (
        build_model,
        init_detector_params,
    )
    from faster_rcnn_pytorch_tpu.utils import checkpoint as ck
    from tests.test_pretrained_backbone import build_torch_vgg16_features

    cache.mkdir(parents=True)
    tv = build_torch_vgg16_features()
    torch.save(tv.state_dict(), cache / pt.CHECKPOINTS["vgg16"][1])

    model, _ = build_model("legacy", num_classes=3, dtype=jnp.float32)
    params = init_detector_params(model, jax.random.key(0), canvas=64)
    out = ck.load_pretrained_backbone(params, "auto", "legacy")
    w = tv.state_dict()["features.0.weight"].numpy()  # OIHW
    got = out["params"]["extractor"]["conv0"]["kernel"]  # HWIO
    assert jnp.allclose(got, jnp.asarray(w.transpose(2, 3, 1, 0))), (
        "conv0 kernel must come from the staged ImageNet file"
    )
