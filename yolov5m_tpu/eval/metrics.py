"""COCO-style mean average precision — own implementation.

Replaces the reference's torchmetrics MeanAveragePrecision dependency
(reference utils/validation_utils.py:7,128-133) with a numpy COCO evaluator:
101-point interpolated PR integration over IoU thresholds 0.50:0.95:0.05,
greedy per-image matching (highest-confidence detection takes the best
still-unmatched GT with IoU ≥ t, COCOeval semantics).

Two fixes vs the reference's usage (SURVEY.md §2 quirks):
  * predictions accumulate per image, not as whole-batch concatenations
    (the reference's torch.cat at bboxes_utils.py:209 mixes boxes across
    images inside one mAP "image");
  * ground truth comes from raw labels, not NMS'd grid-decoded targets.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.5, 1.0, 0.05), 2)  # 0.50 … 0.95
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) xyxy vs (M,4) xyxy → (N,M)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    ix = np.clip(np.minimum(a[:, None, 2], b[None, :, 2])
                 - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    iy = np.clip(np.minimum(a[:, None, 3], b[None, :, 3])
                 - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = ix * iy
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


class MeanAveragePrecision:
    """Streaming accumulator: update(preds, targets) per image, then compute().

    preds:   dict(boxes=(n,4) xyxy, scores=(n,), labels=(n,))
    targets: dict(boxes=(m,4) xyxy, labels=(m,))
    """

    def __init__(self, iou_thresholds: Optional[Sequence[float]] = None,
                 max_det: Optional[int] = None):
        """max_det: COCOeval's maxDets — keep only the top-k detections by
        score per (image, category), matching pycocotools evaluateImg's
        `dt = dt[0:maxDet]` under useCats=1 (COCO uses 100; torchmetrics'
        headline `map` likewise). Default None: the detection pipeline
        already caps at 300 per image via NMS (reference
        bboxes_utils.py:207)."""
        self.iou_thresholds = np.asarray(
            iou_thresholds if iou_thresholds is not None else IOU_THRESHOLDS)
        self.max_det = max_det
        self._records: List[tuple] = []   # (scores, tp_matrix, pred_cls)
        self._gt_counts: Dict[int, int] = {}

    def update(self, preds: dict, targets: dict) -> None:
        boxes = np.asarray(preds["boxes"], np.float32).reshape(-1, 4)
        scores = np.asarray(preds["scores"], np.float32).reshape(-1)
        labels = np.asarray(preds["labels"]).reshape(-1).astype(int)
        gt_boxes = np.asarray(targets["boxes"], np.float32).reshape(-1, 4)
        gt_labels = np.asarray(targets["labels"]).reshape(-1).astype(int)

        for c in gt_labels:
            self._gt_counts[c] = self._gt_counts.get(c, 0) + 1

        if len(boxes) == 0:
            return

        order = np.argsort(-scores, kind="stable")
        boxes, scores, labels = boxes[order], scores[order], labels[order]
        if self.max_det is not None:
            # per (image, category), like COCOeval under useCats=1 — a
            # global top-k would let a dense class evict another class's
            # detections entirely
            keep = np.ones(len(labels), bool)
            for c in np.unique(labels):
                idx = np.nonzero(labels == c)[0]
                keep[idx[self.max_det:]] = False
            boxes, scores, labels = boxes[keep], scores[keep], labels[keep]

        nt = len(self.iou_thresholds)
        thr = self.iou_thresholds[:, None]                  # (nt, 1)
        tp = np.zeros((len(boxes), nt), bool)
        for c in np.unique(labels):
            det_idx = np.nonzero(labels == c)[0]
            gt_idx = np.nonzero(gt_labels == c)[0]
            if len(gt_idx) == 0:
                continue
            iou = _iou_matrix(boxes[det_idx], gt_boxes[gt_idx])
            # greedy matching, all IoU thresholds in lockstep: the detection
            # loop is inherently sequential (GT availability depends on
            # earlier matches), but each threshold matches independently —
            # one (nt, n_gt) taken-mask pass per detection instead of a
            # python loop per (detection, threshold)
            taken = np.zeros((nt, len(gt_idx)), bool)
            for di in range(len(det_idx)):
                cand = ~taken & (iou[di][None, :] >= thr)   # (nt, n_gt)
                has = cand.any(axis=1)
                best = np.argmax(np.where(cand, iou[di][None, :], -1.0), axis=1)
                taken[has, best[has]] = True
                tp[det_idx[di]] = has
        self._records.append((scores, tp, labels))

    def compute(self) -> Dict[str, float]:
        if not self._records:
            return {"map": -1.0, "map_50": -1.0, "map_75": -1.0}
        scores = np.concatenate([r[0] for r in self._records])
        tp = np.concatenate([r[1] for r in self._records])
        labels = np.concatenate([r[2] for r in self._records])

        order = np.argsort(-scores, kind="stable")
        tp, labels = tp[order], labels[order]

        classes = sorted(self._gt_counts)
        nt = len(self.iou_thresholds)
        ap = np.full((len(classes), nt), np.nan)

        for ci, c in enumerate(classes):
            n_gt = self._gt_counts[c]
            sel = labels == c
            if n_gt == 0:
                continue
            if not sel.any():
                ap[ci] = 0.0
                continue
            tpc = tp[sel].astype(np.float64)            # (nd, nt)
            cum_tp = np.cumsum(tpc, axis=0)
            cum_fp = np.cumsum(1 - tpc, axis=0)
            recall = cum_tp / n_gt
            precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
            for ti in range(nt):
                # monotone-decreasing precision envelope + 101-pt integration
                p = precision[:, ti]
                r = recall[:, ti]
                p_env = np.maximum.accumulate(p[::-1])[::-1]
                interp = np.zeros_like(RECALL_POINTS)
                idx = np.searchsorted(r, RECALL_POINTS, side="left")
                valid = idx < len(p_env)
                interp[valid] = p_env[idx[valid]]
                ap[ci, ti] = interp.mean()

        mean_ap = np.nanmean(ap, axis=0)                 # (nt,)
        t50 = int(np.argmin(np.abs(self.iou_thresholds - 0.5)))
        t75 = int(np.argmin(np.abs(self.iou_thresholds - 0.75)))
        return {
            "map": float(np.nanmean(mean_ap)),
            "map_50": float(mean_ap[t50]),
            "map_75": float(mean_ap[t75]),
            "ap_per_class": {int(c): float(np.nanmean(ap[ci]))
                             for ci, c in enumerate(classes)},
        }

    def reset(self) -> None:
        self._records.clear()
        self._gt_counts.clear()
