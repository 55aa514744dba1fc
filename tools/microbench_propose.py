"""A/B the FPN propose top-k selection: global vs per-level (exact).

FRT_LEVEL_TOPK=1 switches propose() to a per-level top-k + merge
(rpn.py) whose output is bit-identical (tests/test_propose_level_topk)
— this script decides whether it is faster on the real chip at the FPN
predict shapes (800x1344 canvas, ~159k anchors, pre_k 2000) and at the
train budget (pre_k 4000). Flip the env default only on a measured win.

Usage: python tools/microbench_propose.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache  # noqa: E402

_enable_cache()

from faster_rcnn_pytorch_tpu.models import rpn  # noqa: E402
from faster_rcnn_pytorch_tpu.models.anchors import (  # noqa: E402
    fpn_anchors,
    fpn_level_sizes,
)
from tools.chaintime import chain_time  # noqa: E402

CANVAS = (800, 1344)


def bench(pre_k: int, post_k: int):
    h, w = CANVAS
    anchors = jnp.asarray(fpn_anchors(h, w))
    level_sizes = fpn_level_sizes(h, w)
    n = sum(level_sizes)
    rs = np.random.RandomState(0)
    cls = jnp.asarray(rs.normal(size=(n, 2)).astype(np.float32))
    reg = jnp.asarray(rs.normal(scale=0.1, size=(n, 4)).astype(np.float32))
    extent = jnp.asarray([1.0, 1.0], jnp.float32)

    def step_fn(ls):
        def step(i, cls_, reg_):
            p = rpn.propose(
                cls_ + 1e-6 * i.astype(jnp.float32),
                reg_,
                anchors,
                extent,
                pre_k=pre_k,
                post_k=post_k,
                level_sizes=ls,
            )
            return p.scores.sum() + p.rois.sum()

        return step

    results = {}
    for name, env, ls in (
        ("global", "0", None),
        ("per-level", "1", level_sizes),
    ):
        os.environ["FRT_LEVEL_TOPK"] = env
        dt, *_ = chain_time(step_fn(ls), args=(cls, reg))
        results[name] = dt
        print(f"  propose pre_k={pre_k}: {name:9s} {dt*1000:7.3f} ms")
    # Cross-check outputs match on-chip too (trace-time env is captured
    # per jit, so build both explicitly).
    os.environ["FRT_LEVEL_TOPK"] = "1"
    a = rpn.propose(cls, reg, anchors, extent, pre_k=pre_k, post_k=post_k,
                    level_sizes=level_sizes)
    b = rpn.propose(cls, reg, anchors, extent, pre_k=pre_k, post_k=post_k)
    ok = bool(
        jnp.array_equal(a.rois, b.rois)
        & jnp.array_equal(a.scores, b.scores)
        & jnp.array_equal(a.valid, b.valid)
    )
    print(f"  outputs identical: {ok}")
    return results, ok


def main():
    print(f"backend: {jax.default_backend()}, canvas {CANVAS}")
    for pre_k, post_k in ((2000, 1000), (4000, 1000)):
        bench(pre_k, post_k)


if __name__ == "__main__":
    main()
