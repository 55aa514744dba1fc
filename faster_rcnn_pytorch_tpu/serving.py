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


def cast_for_serving(model, params):
    """Params at the inference compute dtype (bit-equal outputs,
    utils/params.py): bf16 weights instead of fp32 + an in-program cast
    — half the bytes, and the per-step cast's HBM traffic disappears."""
    from faster_rcnn_pytorch_tpu.utils.params import (
        cast_inference_params,
        model_compute_dtype,
    )

    return cast_inference_params(params, model_compute_dtype(model))


def make_serving_fn(
    model, cfg, params, score_threshold: float | None = None
) -> Callable[[Array, Array], Array]:
    """Jitted ``(images, extents) -> packed [B, D, 7]`` with params
    closed over (they become baked constants under ``jax.export``)."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict

    params = cast_for_serving(model, params)

    @jax.jit
    def serve(images, extents):
        det = model.apply(
            params, cfg, images, extents, score_threshold, method=predict
        )
        return pack_detections(det)

    return serve


def make_serving_fn_args(
    model, cfg, score_threshold: float | None = None
) -> Callable[[dict, Array, Array], Array]:
    """Jitted ``(params, images, extents) -> packed [B, D, 7]`` with
    params as CALL ARGUMENTS: under ``jax.export`` the weights stay out
    of the StableHLO body (fed at call time from a sidecar file). Same
    rule bench.py applies (commit 8d4344c) — a 274 MB baked legacy body
    trips remote_compile HTTP limits through the tunnelled runtime;
    the argument-style program is a few MB regardless of model size."""
    from faster_rcnn_pytorch_tpu.models.faster_rcnn import predict

    @jax.jit
    def serve(params, images, extents):
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
    params_as_args: bool = False,
):
    """Export the predict program for one (canvas, batch) bucket.

    Returns a ``jax.export.Exported``; serialize with
    :func:`save_artifact`. ``platforms=None`` targets the current
    backend only. With ``params_as_args`` the program takes the params
    tree as its first argument (weights live in a sidecar file written
    by :func:`save_params_sidecar`, shared by every bucket) instead of
    baking them as constants.
    """
    h, w = canvas_hw
    img = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    ext = jax.ShapeDtypeStruct((batch, 2), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if params_as_args:
        serve = make_serving_fn_args(model, cfg, score_threshold)
        pspec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            cast_for_serving(model, params),
        )
        return jax.export.export(serve, **kwargs)(pspec, img, ext)
    serve = make_serving_fn(model, cfg, params, score_threshold)
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


#: canonical sidecar file name inside an export dir (one per dir — the
#: cast params are identical for every bucket).
PARAMS_SIDECAR = "weights.msgpack"


def save_params_sidecar(model, params, path: str) -> None:
    """Serving-dtype weights as a flax msgpack blob (atomic write)."""
    from flax import serialization

    data = serialization.to_bytes(cast_for_serving(model, params))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_params_sidecar(path: str):
    """Sidecar -> params pytree of device arrays (one transfer at load;
    callers reuse the same committed buffers on every request)."""
    from flax import serialization

    with open(path, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    return jax.tree.map(jnp.asarray, restored)


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
        self._entry: dict[tuple[int, int, int], dict] = {}
        for e in self.manifest["artifacts"]:
            h, w = e["canvas_hw"]
            key = (int(e["batch"]), int(h), int(w))
            self._index[key] = os.path.join(export_dir, e["file"])
            self._entry[key] = e
        self._cache: dict[tuple[int, int, int], Callable] = {}
        self._sidecar_params = None  # lazy, shared across buckets

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
            call = load_artifact(self._index[key])
            if self._entry[key].get("params_as_args"):
                if self._sidecar_params is None:
                    self._sidecar_params = load_params_sidecar(
                        os.path.join(
                            self.export_dir,
                            self.manifest.get(
                                "params_file", PARAMS_SIDECAR
                            ),
                        )
                    )
                params = self._sidecar_params
                self._cache[key] = (
                    lambda img, ext, _c=call, _p=params: _c(_p, img, ext)
                )
            else:
                self._cache[key] = call
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
