"""Chaintime attribution of the FPN 90-class multiclass_nms tail.

VERDICT r2 candidate (b): the pipelined stage profile charged 2.4 ms to
multiclass_nms at FPN predict shapes (90 fg classes x 1000 rois,
compact top-512 path). This measures it under chaintime (the pipelined
profile overstates small stages by the dispatch floor), splits the
top_k compaction from the NMS sweep, and probes the two structured
candidates: a smaller candidate budget and a bf16 IoU sweep
(bf16 would be NON-exact — only worth discussing if it pays).

Run on the chip: python tools/microbench_multiclass_nms.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from faster_rcnn_pytorch_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from tools.chaintime import chain_time

from faster_rcnn_pytorch_tpu.ops.nms import multiclass_nms, nms

N_ROI = 1000
N_CLS = 91  # incl. background
THRES = 0.05
IOU = 0.3


def main():
    rs = np.random.RandomState(0)
    # realistic peaky probs: softmax over logits with a dominant class
    logits = rs.normal(size=(N_ROI, N_CLS)).astype(np.float32)
    logits[np.arange(N_ROI), rs.randint(0, N_CLS, N_ROI)] += 4.0
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )
    xy1 = rs.uniform(0, 0.7, size=(N_ROI, N_CLS, 2))
    wh = rs.uniform(0.05, 0.3, size=(N_ROI, N_CLS, 2))
    boxes = jnp.asarray(
        np.concatenate([xy1, np.minimum(xy1 + wh, 1.0)], -1).astype(np.float32)
    )

    n_above = int((np.asarray(probs[:, 1:]) > THRES).sum())
    print(f"candidates above {THRES}: {n_above} (budget 512)")

    def full(i, b, p):
        out = multiclass_nms(
            b, p + i * 1e-9, THRES, IOU, N_CLS, max_det=100
        )
        return out[0].sum() + out[2].sum()

    def full_k256(i, b, p):
        out = multiclass_nms(
            b, p + i * 1e-9, THRES, IOU, N_CLS, max_det=100, candidate_k=256
        )
        return out[0].sum() + out[2].sum()

    def topk_only(i, b, p):
        flat = (p[:, 1:] + i * 1e-9).T.reshape(-1)
        v, idx = jax.lax.top_k(flat, 512)
        return v.sum() + b.reshape(-1, 4)[idx].sum()

    # the compacted sweep in isolation (512 sorted candidates -> 100)
    cand_boxes = jnp.asarray(rs.uniform(0, 1, size=(512, 4)).astype(np.float32))
    cand_scores = jnp.asarray(np.sort(rs.uniform(size=512))[::-1].copy())

    def sweep_only(i, cb, cs):
        keep_idx, keep_valid = nms(
            cb, cs + i * 1e-9, IOU, post_k=100,
            valid=jnp.ones((512,), bool), tile=256, assume_sorted=True,
        )
        return keep_idx.sum() + keep_valid.sum()

    def sweep_tile128(i, cb, cs):
        keep_idx, keep_valid = nms(
            cb, cs + i * 1e-9, IOU, post_k=100,
            valid=jnp.ones((512,), bool), tile=128, assume_sorted=True,
        )
        return keep_idx.sum() + keep_valid.sum()

    for name, fn, args in (
        ("FULL multiclass_nms (k_cand 512)", full, (boxes, probs)),
        ("FULL multiclass_nms (k_cand 256)", full_k256, (boxes, probs)),
        ("top_k 512 of 90k + gather", topk_only, (boxes, probs)),
        ("NMS sweep 512->100 (tile 256)", sweep_only, (cand_boxes, cand_scores)),
        ("NMS sweep 512->100 (tile 128)", sweep_tile128, (cand_boxes, cand_scores)),
    ):
        t, *_ = chain_time(fn, args=args)
        print(f"{name:36s}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
