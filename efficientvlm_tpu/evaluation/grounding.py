"""Grounding evaluation: IoU@0.5 accuracy of predicted boxes against
RefCOCO+ references (reference dataset/utils.py:166-335 grounding_eval_bbox
semantics, without the REFER api dependency — caller supplies the
ref_id -> gt box (xywh) mapping and split)."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def compute_iou_xywh(box1, box2) -> float:
    x0 = max(box1[0], box2[0])
    y0 = max(box1[1], box2[1])
    x1 = min(box1[0] + box1[2], box2[0] + box2[2])
    y1 = min(box1[1] + box1[3], box2[1] + box2[3])
    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
    union = box1[2] * box1[3] + box2[2] * box2[3] - inter
    return inter / union if union > 0 else 0.0


def grounding_eval_bbox(
    results: List[dict],
    ref_boxes: Dict[int, list],
    ref_splits: Dict[int, str],
    *,
    iou_thresh: float = 0.5,
) -> dict:
    """results: [{'ref_id', 'pred': [cx,cy,w,h] normalized, 'width','height'}].
    Returns accuracy per split (val/testA/testB)."""
    correct = {"val": 0, "testA": 0, "testB": 0}
    total = {"val": 0, "testA": 0, "testB": 0}
    for r in results:
        ref_id = r["ref_id"]
        split = ref_splits.get(ref_id)
        if split not in total:
            continue
        cx, cy, w, h = r["pred"]
        W, H = r["width"], r["height"]
        pred_xywh = [(cx - w / 2) * W, (cy - h / 2) * H, w * W, h * H]
        iou = compute_iou_xywh(pred_xywh, ref_boxes[ref_id])
        total[split] += 1
        correct[split] += int(iou >= iou_thresh)
    return {k: 100.0 * correct[k] / total[k] if total[k] else 0.0 for k in total}


def nlvr_accuracy(predictions: np.ndarray, targets: np.ndarray) -> float:
    """reference Eff_NLVR.py:194-219."""
    return 100.0 * float((np.asarray(predictions).argmax(-1) == np.asarray(targets)).mean())
