"""Measure the reference's own predict path on the installed torch-CPU.

The reference publishes no throughput numbers (BASELINE.md); this runs
the ACTUAL reference model code (/root/reference/models/model.py FRCNN
.predict + _suppress) on CPU with the three torchvision entry points
stubbed (vgg16 built from torch.nn with random weights; numpy greedy NMS
with torchvision semantics; adaptive-max RoIPool), and writes the result
to BASELINE_MEASURED.json. This is a *floor*: the reference targets GPU,
which is unavailable and remains unmeasured.

Run once: python tools/measure_torch_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn as tnn

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_pretrained_backbone import build_torch_vgg16_features  # noqa: E402
from tests.test_reference_parity import _tv_nms  # noqa: E402


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


def main() -> None:
    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_models.vgg16 = lambda pretrained=False, **k: build_torch_vgg16_features()
    tv_ops.nms = _tv_nms
    tv_ops.RoIPool = _RoIPool
    tv.models, tv.ops = tv_models, tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.ops"] = tv_ops
    torch.Tensor.get_device = lambda self: torch.device("cpu")
    torch.get_device = lambda t: torch.device("cpu")

    sys.path.insert(0, REFERENCE)
    import contextlib
    import io

    from models.model import FRCNN  # the reference model, verbatim

    with contextlib.redirect_stdout(io.StringIO()):
        model = FRCNN(num_classes=21).eval()
    opts = types.SimpleNamespace(thres=0.05)

    rs = np.random.RandomState(0)
    x = torch.from_numpy(rs.normal(size=(1, 3, 800, 800)).astype(np.float32))

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        model.predict(x, opts)  # warmup
        n_iter = 3
        t0 = time.perf_counter()
        for _ in range(n_iter):
            model.predict(x, opts)
        elapsed = time.perf_counter() - t0

    img_per_sec = n_iter / elapsed
    result = {
        "metric": "reference_predict_800px_torch_cpu_images_per_sec",
        "value": round(img_per_sec, 4),
        "unit": "images/sec",
        "environment": {
            "device": "cpu",
            "torch": torch.__version__,
            "threads": torch.get_num_threads(),
            "note": (
                "reference models/model.py FRCNN.predict run verbatim on "
                "torch-CPU (vgg16 random weights, numpy NMS, naive RoIPool "
                "stubs). This is a floor; the reference's GPU throughput "
                "is unpublished and unmeasured in this image."
            ),
        },
    }
    out_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
