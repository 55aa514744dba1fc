"""Measure the reference's own predict paths on the installed torch-CPU.

The reference publishes no throughput numbers (BASELINE.md); this runs
the ACTUAL reference model code for BOTH generations —
/root/reference/models/model.py FRCNN.predict (legacy VGG16) and
/root/reference/models/new_model.py FRCNN.predict (ResNet50-FPN) — on
CPU via the shared torchvision-stub loader (tests/reference_loader.py),
and writes the results to BASELINE_MEASURED.json.

The exactness-oriented numpy pooling oracles the parity tests use would
unfairly slow the baseline, so this tool patches in throughput-
equivalent vectorized torch pooling (adaptive-max RoIPool; grid_sample
MultiScaleRoIAlign). Exactness is covered by the repo's kernel and
parity tests, not here. These are *floors*: the reference targets GPU,
which is unavailable and remains unmeasured in this image.

Run once: python tools/measure_torch_baseline.py
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.reference_loader import reference_modules  # noqa: E402


class _RoIPool(tnn.Module):
    """Throughput-equivalent RoIPool: per-roi adaptive max pool (the cost
    is dominated by the backbone; exactness is covered by the repo's
    kernel tests, not this baseline)."""

    def __init__(self, output_size, spatial_scale):
        super().__init__()
        self.out = output_size if isinstance(output_size, tuple) else (output_size, output_size)
        self.scale = spatial_scale

    def forward(self, feats, rois):
        # torchvision accepts a list of per-image [n, 4] roi tensors; the
        # reference passes [rois_of_image_0] (models/model.py:111-113)
        if isinstance(rois, (list, tuple)):
            rois = torch.cat(
                [
                    torch.cat(
                        [torch.full((r.shape[0], 1), float(b)), r], dim=1
                    )
                    for b, r in enumerate(rois)
                ]
            )
        n = rois.shape[0]
        _, c, h, w = feats.shape
        out = torch.zeros(n, c, *self.out)
        for i in range(n):
            b = int(rois[i, 0])
            x1, y1, x2, y2 = (rois[i, 1:] * self.scale).round().long()
            x1, y1 = max(int(x1), 0), max(int(y1), 0)
            x2 = min(int(x2) + 1, w)
            y2 = min(int(y2) + 1, h)
            if x2 <= x1 or y2 <= y1:
                continue
            out[i] = torch.nn.functional.adaptive_max_pool2d(
                feats[b, :, y1:y2, x1:x2], self.out
            )
        return out


class _FastMSRoIAlign(tnn.Module):
    """Throughput-equivalent MultiScaleRoIAlign: torchvision's LevelMapper
    routing + vectorized grid_sample bilinear sampling (sampling_ratio
    points per bin edge, averaged) instead of the per-roi numpy oracle.
    Semantically ~roi_align(aligned=False); edge clamping differs at the
    feature border, which is irrelevant for a throughput floor."""

    def __init__(self, featmap_names, output_size, sampling_ratio):
        super().__init__()
        self.featmap_names = featmap_names
        self.out = output_size if isinstance(output_size, int) else output_size[0]
        self.ratio = sampling_ratio

    def forward(self, features, boxes_list, image_shapes):
        feats = [features[k] for k in self.featmap_names]
        rois = boxes_list[0]
        orig = image_shapes[0]
        # The reference passes image_shapes as [(w, h)] (models/
        # new_model.py:143), so orig[0] is WIDTH while f.shape[-2] is
        # feature HEIGHT — mirroring the reference-as-run. The square
        # measurement below makes the orientation moot; guard against a
        # future non-square resolution silently routing levels wrong.
        assert orig[0] == orig[1], "non-square input: audit scale inference"
        scales = [
            2.0 ** float(np.round(np.log2(float(f.shape[-2]) / orig[0])))
            for f in feats
        ]
        k_min = int(-np.log2(scales[0]))
        k_max = int(-np.log2(scales[-1]))
        areas = ((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])).clamp(min=0)
        lvls = torch.floor(4 + torch.log2(areas.sqrt() / 224.0 + 1e-36) + 1e-6)
        lvls = lvls.clamp(k_min, k_max).long() - k_min

        n = rois.shape[0]
        c = feats[0].shape[1]
        g = self.out * self.ratio  # sample grid side per roi
        pooled = torch.zeros(n, c, self.out, self.out)
        for li, (f, sc) in enumerate(zip(feats, scales)):
            idx = (lvls == li).nonzero(as_tuple=True)[0]
            if idx.numel() == 0:
                continue
            r = rois[idx] * sc
            w = (r[:, 2] - r[:, 0]).clamp(min=1.0)
            h = (r[:, 3] - r[:, 1]).clamp(min=1.0)
            # g uniformly spaced sample centers per axis across the roi
            steps = (torch.arange(g, dtype=torch.float32) + 0.5) / g
            ys = r[:, 1, None] + steps[None, :] * h[:, None]  # [k, g]
            xs = r[:, 0, None] + steps[None, :] * w[:, None]
            fh, fw = f.shape[-2:]
            gy = (ys + 0.5) * (2.0 / fh) - 1.0
            gx = (xs + 0.5) * (2.0 / fw) - 1.0
            grid = torch.stack(
                [
                    gx[:, None, :].expand(-1, g, -1),
                    gy[:, :, None].expand(-1, -1, g),
                ],
                dim=-1,
            ).reshape(1, -1, g, 2)  # [1, k*g, g, 2]
            samp = F.grid_sample(
                f[:1], grid, mode="bilinear", padding_mode="border",
                align_corners=False,
            )  # [1, c, k*g, g]
            samp = samp.reshape(c, idx.numel(), g, g).permute(1, 0, 2, 3)
            pooled[idx] = F.avg_pool2d(samp, self.ratio)
        return pooled


def _time_predict(model, x, opts, n_iter=3) -> float:
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        model.predict(x, opts)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model.predict(x, opts)
        elapsed = time.perf_counter() - t0
    return n_iter / elapsed


def main() -> None:
    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.normal(size=(1, 3, 800, 800)).astype(np.float32))
    opts = types.SimpleNamespace(thres=0.05)
    out: dict = {}

    with reference_modules() as ref:
        # Swap the exactness-oriented pooling oracles for vectorized
        # torch equivalents before the models capture them.
        ref.model.RoIPool = _RoIPool
        ref.new_model.MultiScaleRoIAlign = _FastMSRoIAlign

        with contextlib.redirect_stdout(io.StringIO()):
            legacy = ref.model.FRCNN(num_classes=21).eval()
        out["legacy_predict"] = {
            "metric": "reference_legacy_predict_800px_torch_cpu_images_per_sec",
            "value": round(_time_predict(legacy, x, opts), 4),
        }
        del legacy

        torch.manual_seed(9)
        with contextlib.redirect_stdout(io.StringIO()):
            fpn = ref.new_model.FRCNN(num_classes=91).eval()
        out["fpn_predict"] = {
            "metric": "reference_fpn_predict_800px_torch_cpu_images_per_sec",
            "value": round(_time_predict(fpn, x, opts), 4),
        }

    out["environment"] = {
        "device": "cpu",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "note": (
            "reference models/model.py and models/new_model.py "
            "FRCNN.predict run verbatim on torch-CPU (random weights; "
            "torchvision entry points replaced by throughput-equivalent "
            "torch stand-ins: numpy greedy NMS, adaptive-max RoIPool, "
            "grid_sample MultiScaleRoIAlign). These are floors; the "
            "reference's GPU throughput is unpublished and unmeasured "
            "in this image."
        ),
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
