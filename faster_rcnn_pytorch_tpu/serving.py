"""AOT export for serving: the detector as a self-contained artifact.

The reference's deployment story is re-running a torch checkpoint
through Python model code (demo.py:22-69, models/model_.py:271-312
pretrained bootstrap). The TPU-native equivalent is an ahead-of-time
serialized XLA program: :func:`export_predict` captures the jitted
predict — params baked in as constants — as a portable StableHLO
artifact (`jax.export`). A serving host loads the bytes and calls them
with zero framework code: no flax module, no checkpoint plumbing, no
config object — just ``(images, extents) -> packed detections``.

Artifact calling convention (one call per canvas bucket):

  images  [B, H, W, 3] float32 — normalized canvas batch (the loader's
          contract: ImageNet-normalized, zero-padded to the canvas)
  extents [B, 2] float32       — valid (w, h) fraction per image
  ->      [B, D, 7] float32    — per-detection (x1, y1, x2, y2 in [0,1]
          canvas coords, label, score, valid>0.5), the same packed
          layout the evaluator fetches (engine/evaluate.py).

Cross-platform notes: kernel dispatch (Pallas fast paths) is decided at
trace time from ``jax.default_backend()`` — an artifact exported on a
TPU host embeds TPU kernels and is TPU-only; exporting with
``platforms=("cpu", "tpu")`` requires the pure-XLA op formulations
(set ``FRT_ALIGN_KERNEL=0`` / ``FRT_FORCE_LAX_OPS=1`` before building
the fn — the CLI in ``export.py`` does this automatically), which are
exact but slower on-chip.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def pack_detections(det) -> Array:
    """``Detections -> [B, D, 7]`` (xyxy, label, score, valid) float32.

    One packed array instead of four: every host fetch through the
    tunnelled runtime is a full round trip, and serving hosts want one
    output buffer per request anyway.
    """
    return jnp.concatenate(
        [
            det.boxes,
            det.labels[..., None].astype(jnp.float32),
            det.scores[..., None],
            det.valid[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )


def make_serving_fn(
    model, cfg, params, score_threshold: float | None = None
) -> Callable[[Array, Array], Array]:
    """Jitted ``(images, extents) -> packed [B, D, 7]`` with params
    closed over (they become baked constants under ``jax.export``)."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict
    from faster_rcnn_pytorch_tpu.utils.params import (
        cast_inference_params,
        model_compute_dtype,
    )

    # Bake bf16 weights instead of fp32 + an in-program cast: bit-equal
    # outputs (utils/params.py), half the artifact size, and the per-step
    # cast's HBM traffic disappears from every exported bucket.
    params = cast_inference_params(params, model_compute_dtype(model))

    @jax.jit
    def serve(images, extents):
        det = model.apply(
            params, cfg, images, extents, score_threshold, method=predict
        )
        return pack_detections(det)

    return serve


def export_predict(
    model,
    cfg,
    params,
    canvas_hw: tuple[int, int],
    batch: int,
    score_threshold: float | None = None,
    platforms: Sequence[str] | None = None,
):
    """Export the predict program for one (canvas, batch) bucket.

    Returns a ``jax.export.Exported``; serialize with
    :func:`save_artifact`. ``platforms=None`` targets the current
    backend only.
    """
    h, w = canvas_hw
    serve = make_serving_fn(model, cfg, params, score_threshold)
    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    ext = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax.export.export(serve, **kwargs)(img, ext)


def save_artifact(exported, path: str) -> None:
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_artifact(path: str) -> Callable[[Array, Array], Array]:
    """Load a serialized artifact; returns the callable program."""
    with open(path, "rb") as f:
        data = f.read()
    return jax.export.deserialize(bytearray(data)).call


def artifact_name(canvas_hw: tuple[int, int], batch: int) -> str:
    return f"predict_{canvas_hw[0]}x{canvas_hw[1]}_b{batch}.jaxexp"


class ExportedDetector:
    """Manifest-driven serving entry point: routes each request to the
    artifact matching its ``(batch, canvas)`` bucket.

    >>> det = ExportedDetector("./export")
    >>> packed = det(images, extents)   # shapes pick the artifact

    Artifacts load lazily on first use and are cached. ``buckets()``
    lists the available ``(batch, (h, w))`` combinations.
    """

    def __init__(self, export_dir: str):
        self.export_dir = export_dir
        with open(os.path.join(export_dir, "manifest.json")) as f:
            self.manifest = json.load(f)
        self._index: dict[tuple[int, int, int], str] = {}
        for e in self.manifest["artifacts"]:
            h, w = e["canvas_hw"]
            self._index[(int(e["batch"]), int(h), int(w))] = os.path.join(
                export_dir, e["file"]
            )
        self._cache: dict[tuple[int, int, int], Callable] = {}

    def buckets(self) -> list[tuple[int, tuple[int, int]]]:
        return [(b, (h, w)) for (b, h, w) in sorted(self._index)]

    def __call__(self, images: Array, extents: Array) -> Array:
        b, h, w = int(images.shape[0]), int(images.shape[1]), int(images.shape[2])
        key = (b, h, w)
        if key not in self._index:
            raise ValueError(
                f"no artifact for batch={b} canvas={h}x{w}; available: "
                f"{self.buckets()}"
            )
        if key not in self._cache:
            self._cache[key] = load_artifact(self._index[key])
        return self._cache[key](images, extents)


def write_manifest(
    out_dir: str,
    entries: list[dict],
    opts=None,
    extra: dict | None = None,
) -> str:
    """``manifest.json`` describing the artifacts: calling convention,
    canvas buckets, class metadata — everything a serving host needs.

    Merges with an existing manifest in ``out_dir`` (entries keyed by
    file name): exporting extra batch sizes into the same directory must
    not orphan the earlier artifacts.
    """
    prev_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f).get("artifacts", [])
        except (OSError, ValueError):
            prev = []
        new_files = {e["file"] for e in entries}
        entries = [e for e in prev if e.get("file") not in new_files] + entries
    manifest = {
        "format": "jax.export/stablehlo",
        "call": "(images [B,H,W,3] f32, extents [B,2] f32) -> [B,D,7] "
        "f32 (x1,y1,x2,y2 canvas-[0,1], label, score, valid)",
        "artifacts": entries,
    }
    if opts is not None:
        manifest["model_generation"] = opts.model_generation
        manifest["data_type"] = opts.data_type
        manifest["num_classes"] = opts.num_classes
        manifest["score_threshold"] = opts.thres
    if extra:
        manifest.update(extra)
    path = os.path.join(out_dir, "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    return path
