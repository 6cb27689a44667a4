"""Grounding evaluation against RefCOCO+ references, covering the full
reference family (dataset/utils.py:165-335) without the REFER api
dependency — callers supply plain dict maps instead of a REFER object:

- grounding_eval_bbox / *_vlue semantics: IoU@0.5 of regressed boxes
  (ref grounding_eval_bbox :259-296, grounding_eval_bbox_vlue :299-331).
- grounding_eval_mask / grounding_eval_mask_vlue: the weakly-supervised
  variant (ref grounding_eval :165-210, grounding_eval_vlue :213-257) —
  a mask_size x mask_size attention mask is bicubic-upsampled to the image
  and detection proposals are ranked by in-box mask mass / area**alpha;
  score = IoU@0.5 of the top-ranked proposal vs the referred box.

The bicubic resize reproduces torch F.interpolate(mode='bicubic',
align_corners=False) exactly (Keys a=-0.75, half-pixel centers, replicated
borders) so rankings match the reference bit-for-bit up to float error —
differentially tested in tests/test_reference_differential.py."""

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


def load_refer_maps(refs_file: str, instances_file: str) -> dict:
    """Build the dict maps the eval functions take from RefCOCO(+/g)
    annotation files — the only parts of the reference's REFER api
    (refTools/refer_python3.py:59-123) the grounding evals consume:
    `refs(<split_by>).p` (pickle list of refs with ref_id/ann_id/image_id/
    split) and the COCO-format `instances.json` (images: id/height/width;
    annotations: id/bbox)."""
    import json
    import pickle

    with open(refs_file, "rb") as f:
        refs = pickle.load(f)
    with open(instances_file) as f:
        instances = json.load(f)
    anns = {a["id"]: a for a in instances["annotations"]}
    return {
        "ref_boxes": {r["ref_id"]: anns[r["ann_id"]]["bbox"] for r in refs},
        "ref_splits": {r["ref_id"]: r["split"] for r in refs},
        "ref_images": {r["ref_id"]: r["image_id"] for r in refs},
        "image_sizes": {i["id"]: (i["height"], i["width"])
                        for i in instances["images"]},
    }


def _cubic_weights(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic-convolution kernel with a=-0.75 (torch bicubic)."""
    ax = np.abs(x)
    near = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
    far = a * (((ax - 5.0) * ax + 8.0) * ax - 4.0)
    return np.where(ax <= 1.0, near, np.where(ax < 2.0, far, 0.0))


def _resize_axis_bicubic(arr: np.ndarray, out_len: int, axis: int) -> np.ndarray:
    in_len = arr.shape[axis]
    if in_len == out_len:
        return arr
    scale = in_len / out_len
    # align_corners=False: half-pixel-center coordinate mapping
    coord = (np.arange(out_len) + 0.5) * scale - 0.5
    base = np.floor(coord).astype(np.int64)
    idx = base[:, None] + np.arange(-1, 3)[None, :]  # (out, 4) support taps
    w = _cubic_weights(coord[:, None] - idx)
    idx = np.clip(idx, 0, in_len - 1)  # replicate borders (no renormalize)
    moved = np.moveaxis(arr, axis, 0)
    gathered = moved[idx]  # (out, 4, ...)
    w = w.reshape(w.shape + (1,) * (gathered.ndim - 2))
    return np.moveaxis((gathered * w).sum(axis=1), 0, axis)


def resize_bicubic(mask: np.ndarray, height: int, width: int) -> np.ndarray:
    """2D bicubic resize == F.interpolate(mode='bicubic', align_corners=False)."""
    mask = np.asarray(mask, np.float64)
    return _resize_axis_bicubic(_resize_axis_bicubic(mask, height, 0), width, 1)


def rank_detections(mask_up: np.ndarray, dets, alpha: float):
    """Pick the proposal maximizing sum(mask inside box) / (w*h)**alpha
    (reference dataset/utils.py:181-188). Box coords are float xywh; slice
    bounds truncate like the reference's int() slicing. Returns the winning
    [x, y, w, h] (None when every score is <= 0 — the reference would crash
    on an unbound pred_box there). Deliberate divergence: coords <= -1 clamp
    to 0 here, while the reference's raw Python slicing would wrap around
    from the array end (nonsensical for boxes; coords in [-1, 0) truncate to
    0 in both)."""
    H, W = mask_up.shape
    ii = np.zeros((H + 1, W + 1))
    ii[1:, 1:] = mask_up.cumsum(0).cumsum(1)  # summed-area table
    best_score, best_box = 0.0, None
    for det in dets:
        x, y, w, h = float(det[0]), float(det[1]), float(det[2]), float(det[3])
        x0 = min(max(int(x), 0), W)
        y0 = min(max(int(y), 0), H)
        x1 = min(max(int(x + w), x0), W)
        y1 = min(max(int(y + h), y0), H)
        mass = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
        score = mass / (w * h) ** alpha
        if score > best_score:
            best_score, best_box = score, [x, y, w, h]
    return best_box


def grounding_eval_mask(
    results: List[dict],
    dets: Dict,
    ref_boxes: Dict[int, list],
    ref_splits: Dict[int, str],
    ref_images: Dict[int, int],
    image_sizes: Dict[int, tuple],
    *,
    alpha: float = 0.5,
    mask_size: int = 24,
    iou_thresh: float = 0.5,
) -> dict:
    """Weakly-supervised grounding accuracy (reference grounding_eval,
    dataset/utils.py:165-210). results: [{'ref_id', 'pred': mask array}];
    dets keyed by image id (int or str, like the reference's json);
    image_sizes: {image_id: (height, width)}. Returns the reference's
    fraction-valued {'val_d', 'testA_d', 'testB_d'}."""
    correct = {"val": 0, "testA": 0, "testB": 0}
    total = {"val": 0, "testA": 0, "testB": 0}
    for r in results:
        ref_id = r["ref_id"]
        split = ref_splits.get(ref_id)
        if split not in total:
            continue
        image_id = ref_images[ref_id]
        height, width = image_sizes[image_id]
        image_dets = dets[image_id] if image_id in dets else dets[str(image_id)]
        mask = np.asarray(r["pred"], np.float64).reshape(mask_size, mask_size)
        pred = rank_detections(resize_bicubic(mask, height, width), image_dets, alpha)
        total[split] += 1
        if pred is not None:
            correct[split] += int(
                compute_iou_xywh(pred, ref_boxes[ref_id]) >= iou_thresh)
    return {f"{k}_d": correct[k] / total[k] if total[k] else 0.0
            for k in ("val", "testA", "testB")}


def grounding_eval_mask_vlue(
    results: List[dict],
    test_records: List[dict],
    *,
    alpha: float = 0.5,
    mask_size: int = 24,
    iou_thresh: float = 0.5,
) -> dict:
    """VLUE single-split variant (reference grounding_eval_vlue,
    dataset/utils.py:213-257): each test record carries its own
    bbox/height/width/dets. Returns {'score': fraction}."""
    ref_map = {rec["ref_id"]: rec for rec in test_records}
    correct, num = 0, 0
    for r in results:
        rec = ref_map[r["ref_id"]]
        mask = np.asarray(r["pred"], np.float64).reshape(mask_size, mask_size)
        pred = rank_detections(
            resize_bicubic(mask, rec["height"], rec["width"]), rec["dets"], alpha)
        num += 1
        if pred is not None:
            correct += int(compute_iou_xywh(pred, rec["bbox"]) >= iou_thresh)
    return {"score": correct / num if num else 0.0}


def grounding_eval_bbox_vlue(
    results: List[dict],
    test_records: List[dict],
    *,
    iou_thresh: float = 0.5,
) -> dict:
    """VLUE single-split bbox variant (reference grounding_eval_bbox_vlue,
    dataset/utils.py:299-331): records carry their own bbox/height/width;
    predictions are normalized cxcywh. Returns {'score': fraction}."""
    ref_map = {rec["ref_id"]: rec for rec in test_records}
    correct, num = 0, 0
    for r in results:
        rec = ref_map[r["ref_id"]]
        cx, cy, w, h = r["pred"]
        width, height = rec["width"], rec["height"]
        pred_xywh = [(cx - w / 2) * width, (cy - h / 2) * height,
                     w * width, h * height]
        num += 1
        correct += int(compute_iou_xywh(pred_xywh, rec["bbox"]) >= iou_thresh)
    return {"score": correct / num if num else 0.0}


def nlvr_accuracy(predictions: np.ndarray, targets: np.ndarray) -> float:
    """reference Eff_NLVR.py:194-219."""
    return 100.0 * float((np.asarray(predictions).argmax(-1) == np.asarray(targets)).mean())
