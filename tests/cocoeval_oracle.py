"""Test-only numpy port of the pycocotools COCOeval bbox protocol.

A deliberately literal, per-image, dict-based port of the matching loop
and accumulation from pycocotools' ``cocoeval.py`` (the module the
reference wraps at evaluation/coco_eval.py:199-244). pycocotools is not
installed in this image; this port exists purely as an independent
oracle to fuzz the repo's vectorised :class:`CocoEvaluator` against —
it mirrors the original control flow (greedy per-threshold matching
with gt ids, ignore-sorted gt order, crowd re-matching, score-mergesort
accumulation, 101-point interpolation) rather than this repo's design.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
MAX_DETS = [1, 10, 100]
AREA_RNG = [
    [0.0, 1e10],      # all
    [0.0, 32.0**2],   # small
    [32.0**2, 96.0**2],  # medium
    [96.0**2, 1e10],  # large
]


def _iou(d_boxes, g_boxes, iscrowd):
    """bbox IoU, xywh input, crowd gt uses detection area as denominator
    (maskUtils.iou semantics)."""
    if len(d_boxes) == 0 or len(g_boxes) == 0:
        return np.zeros((len(d_boxes), len(g_boxes)))
    out = np.zeros((len(d_boxes), len(g_boxes)))
    for di, d in enumerate(d_boxes):
        dx1, dy1, dw, dh = d
        d_area = dw * dh
        for gi, g in enumerate(g_boxes):
            gx1, gy1, gw, gh = g
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = d_area if iscrowd[gi] else d_area + gw * gh - inter
            out[di, gi] = inter / union
    return out


def _evaluate_img(gt, dt, ious, a_rng, max_det):
    """Port of COCOeval.evaluateImg for one (img, cat, area, maxDet)."""
    if len(gt) == 0 and len(dt) == 0:
        return None
    for g in gt:
        g["_ignore"] = (
            1
            if (g["ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1])
            else 0
        )
    gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
    gt = [gt[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
    dt = [dt[i] for i in dtind[:max_det]]
    iscrowd = [int(g["iscrowd"]) for g in gt]
    ious = ious[:, gtind][: len(dt)] if len(ious) > 0 else ious

    T = len(IOU_THRS)
    G = len(gt)
    D = len(dt)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gt])
    dt_ig = np.zeros((T, D))
    if len(ious) > 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dt):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gt):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious[dind, gind] < iou:
                        continue
                    iou = ious[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gt[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array(
        [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]
    ).reshape((1, len(dt)))
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
    )
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dt],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def cocoeval_oracle(gt_dataset: dict, predictions: dict) -> np.ndarray:
    """Run the full bbox protocol; returns the 12 summary stats.

    Args:
      gt_dataset: COCO-format dict (images / annotations / categories).
      predictions: {image_id: {"boxes" xyxy px, "scores", "labels"}}.
    """
    cat_ids = sorted(c["id"] for c in gt_dataset["categories"])
    img_ids = sorted(predictions)

    gts = defaultdict(list)
    gid = 1
    for ann in gt_dataset["annotations"]:
        g = dict(ann)
        g.setdefault("area", g["bbox"][2] * g["bbox"][3])
        g["id"] = gid
        gid += 1
        g.setdefault("iscrowd", 0)
        g["ignore"] = g.get("ignore", 0) or g["iscrowd"]
        gts[(g["image_id"], g["category_id"])].append(g)

    dts = defaultdict(list)
    did = 1
    for img in img_ids:
        p = predictions[img]
        for box, score, label in zip(p["boxes"], p["scores"], p["labels"]):
            x1, y1, x2, y2 = [float(v) for v in box]
            dts[(img, int(label))].append(
                {
                    "id": did,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "area": (x2 - x1) * (y2 - y1),
                    "score": float(score),
                }
            )
            did += 1

    # computeIoU per (img, cat) at the largest maxDet budget
    max_det = MAX_DETS[-1]
    ious = {}
    for img in img_ids:
        for cat in cat_ids:
            gt = gts[(img, cat)]
            dt = dts[(img, cat)]
            inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
            dt = [dt[i] for i in inds[:max_det]]
            ious[(img, cat)] = _iou(
                [d["bbox"] for d in dt],
                [g["bbox"] for g in gt],
                [int(g["iscrowd"]) for g in gt],
            )

    eval_imgs = {
        (img, cat, tuple(a_rng)): _evaluate_img(
            gts[(img, cat)], dts[(img, cat)], ious[(img, cat)], a_rng, max_det
        )
        for cat in cat_ids
        for a_rng in AREA_RNG
        for img in img_ids
    }

    T, R, K, A, M = (
        len(IOU_THRS), len(REC_THRS), len(cat_ids), len(AREA_RNG), len(MAX_DETS),
    )
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cat_ids):
        for a, a_rng in enumerate(AREA_RNG):
            for m, maxd in enumerate(MAX_DETS):
                E = [
                    eval_imgs[(img, cat, tuple(a_rng))] for img in img_ids
                ]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dt_scores = np.concatenate(
                    [e["dtScores"][0:maxd] for e in E]
                )
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, 0:maxd] for e in E], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, 0:maxd] for e in E], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig)
                )
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds2 = np.searchsorted(rc, REC_THRS, side="left")
                    try:
                        for ri, pi in enumerate(inds2):
                            q[ri] = pr[pi]
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.array(q)

    def _summarize(ap=1, iouThr=None, area_idx=0, max_dets=100):
        m = MAX_DETS.index(max_dets)
        if ap == 1:
            s = precision[:, :, :, area_idx, m]
            if iouThr is not None:
                t = np.where(iouThr == IOU_THRS)[0]
                s = s[t]
        else:
            s = recall[:, :, area_idx, m]
            if iouThr is not None:
                t = np.where(iouThr == IOU_THRS)[0]
                s = s[t]
        valid = s[s > -1]
        return -1.0 if valid.size == 0 else float(np.mean(valid))

    return np.array(
        [
            _summarize(1),
            _summarize(1, iouThr=0.5),
            _summarize(1, iouThr=0.75),
            _summarize(1, area_idx=1),
            _summarize(1, area_idx=2),
            _summarize(1, area_idx=3),
            _summarize(0, max_dets=1),
            _summarize(0, max_dets=10),
            _summarize(0, max_dets=100),
            _summarize(0, area_idx=1),
            _summarize(0, area_idx=2),
            _summarize(0, area_idx=3),
        ]
    )
