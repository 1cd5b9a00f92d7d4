"""Validation-time evaluation: class/objectness accuracy + mAP50/75.

Capability parity with the reference evaluator (reference
utils/validation_utils.py:11-144), redesigned for the TPU pipeline:

  * the per-batch device work (forward, decode, NMS, accuracy counts) is one
    jitted graph; only fixed-shape results come back to the host;
  * objectness accuracy reads prediction channel 4 (the reference reads
    channel 0 — x offset — by mistake, validation_utils.py:67; fixed);
  * ground truth for mAP comes straight from the padded labels instead of the
    reference's grid-encode → decode → NMS round trip
    (validation_utils.py:104-110), and predictions are matched per image,
    not per concatenated batch (quirks in SURVEY.md §2);
  * eval.csv rows keep the reference schema
    (epoch, class_accuracy, obj_accuracy, map50, map75 —
    validation_utils.py:28-31).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import Config
from yolov5m_tpu.eval.metrics import MeanAveragePrecision
from yolov5m_tpu.ops.boxes import xywhn_to_xyxy_np
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.train.targets import build_grid_targets


class Evaluator:
    """Runs accuracy + mAP over a val loader for a given model/params."""

    def __init__(self, model, anchors_norm, cfg: Config,
                 anchors_px: Optional[np.ndarray] = None,
                 fused_eval: bool = True,
                 overlap: Optional[bool] = None):
        self.model = model
        self.anchors_norm = jnp.asarray(anchors_norm)   # (nl, na, 2) / stride
        self.anchors_px = (np.asarray(anchors_px) if anchors_px is not None
                           else np.asarray(anchors_norm) * np.asarray(
                               [8, 16, 32], np.float32)[:, None, None])
        self.cfg = cfg
        # fused_eval: fold BN into the convs on device inside the eval jit
        # (exact — see models/fuse.py) so the eval graph runs BN-free. Applies
        # only when the model has BN (fused=False) and variables carry
        # batch_stats; decided per call in eval_batch.
        can_fuse = (fused_eval and hasattr(model, "clone")
                    and getattr(model, "fused", None) is False)
        self._fused_model = model.clone(fused=True) if can_fuse else None
        # overlap: dispatch batch i+1 before syncing batch i so the ~7ms/img
        # host matcher hides behind device eval. Measured 11-22% faster on
        # the TPU relay with identical per-image work in both arms
        # (benchmarks/profile_eval_wall.py, alternating reps); overlap=False
        # forces a full sync between batches (debugging aid).
        self.overlap = True if overlap is None else overlap
        self._eval_batch = self._build_eval_batch()

    def _build_eval_batch(self):
        cfg = self.cfg

        @jax.jit
        def eval_batch(variables, image, labels, mask):
            if self._fused_model is not None and "batch_stats" in variables:
                from yolov5m_tpu.models.fuse import fold_batchnorm_device
                preds = self._fused_model.apply(
                    fold_batchnorm_device(variables), image, train=False)
            else:
                preds = self.model.apply(variables, image, train=False)

            # --- fused gate+decode+NMS (fixed shape) ---
            det, det_valid = fused_detect(
                preds, self.anchors_norm,
                conf_threshold=cfg.conf_threshold,
                iou_threshold=cfg.nms_iou_thresh,
                max_detections=cfg.max_detections,
                pre_nms_topk=cfg.pre_nms_topk)

            # --- class / objectness accuracy vs grid targets ---
            grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
            targets = build_grid_targets(labels, mask, jnp.asarray(self.anchors_px),
                                         grid_sizes, cfg.ignore_iou_thresh)
            correct_cls = total_cls = correct_obj = total_obj = 0.0
            for p, t in zip(preds, targets):
                pos = t[..., 4] == 1.0
                pred_cls = jnp.argmax(p[..., 5:], axis=-1)
                correct_cls += jnp.sum(jnp.where(pos, pred_cls == t[..., 5], False))
                total_cls += jnp.sum(pos)
                # channel 4 = objectness (reference bug reads channel 0).
                # The 0.01 eval gate as the decision threshold is also the
                # reference's semantics (validation_utils.py:66 passes
                # config.CONF_THRESHOLD) — it saturates toward 100% once
                # positives clear logit -4.6, so treat obj_accuracy as an
                # early-training signal, not a calibrated metric.
                obj_pred = jax.nn.sigmoid(p[..., 4]) > cfg.conf_threshold
                correct_obj += jnp.sum(jnp.where(pos, obj_pred, False))
                total_obj += jnp.sum(pos)

            return det, det_valid, jnp.stack(
                [correct_cls, total_cls, correct_obj, total_obj])

        return eval_batch

    def run(self, variables, loader: Iterable[dict],
            coco_dump_dir: Optional[str] = None,
            class_names=None,
            confusion_csv: Optional[str] = None) -> dict:
        """Evaluate over a BatchLoader. Returns metrics dict.

        coco_dump_dir: also write standard COCO-format annotations.json +
        results.json there (eval/coco_dump.py) so the run can be re-scored
        externally with pycocotools/torchmetrics.
        confusion_csv: also accumulate an Ultralytics-style per-class
        confusion matrix (eval/confusion.py) and write it as CSV.
        """
        dump = None
        if coco_dump_dir is not None:
            from yolov5m_tpu.eval.coco_dump import CocoDump
            dump = CocoDump(class_names)
        cmat = None
        if confusion_csv is not None:
            from yolov5m_tpu.eval.confusion import ConfusionMatrix
            cmat = ConfusionMatrix(self.cfg.nc)
        image_id = 0
        mapm = MeanAveragePrecision()
        counts = np.zeros(4)

        # Software pipeline (depth 1, self.overlap, default on): JAX
        # dispatch is asynchronous, so the device evaluates batch i+1 while
        # the host runs the greedy matcher over batch i's results
        # (~7ms/image host-side; 11-22% wall-time saving measured even over
        # the relay). With overlap=False each batch is fully synced before
        # the next dispatch. np.asarray() below is the sync point for the
        # previous dispatch.
        def start(batch):
            return batch, self._eval_batch(
                variables, jnp.asarray(batch["image"]),
                jnp.asarray(batch["labels"]), jnp.asarray(batch["mask"]))

        it = iter(loader)
        try:
            pending = start(next(it))
        except StopIteration:
            pending = None
        while pending is not None:
            batch, (det, det_valid, c) = pending
            if self.overlap:
                try:
                    pending = start(next(it))   # dispatch next before syncing
                except StopIteration:
                    pending = None
            h, w = batch["image"].shape[1:3]
            counts += np.asarray(c)
            det = np.asarray(det)
            det_valid = np.asarray(det_valid)
            # rows padded to complete a short final batch are marked invalid
            # by the loader — skip them so no image is ever counted twice
            # (nor a zero-padded blank counted at all)
            image_valid = np.asarray(batch.get(
                "image_valid", np.ones(det.shape[0], bool)))
            # per-image source-image sizes: areas for the small/medium/large
            # buckets (and the COCO dump coordinates) are in ORIGINAL image
            # pixels, like COCOeval — the network-space boxes are rescaled by
            # the per-axis resize ratio (identity when the loader has no
            # original-size info, e.g. synthetic batches)
            orig_hw = np.asarray(batch.get(
                "orig_hw", np.tile([h, w], (det.shape[0], 1))))
            for b in range(det.shape[0]):
                if not image_valid[b]:
                    continue
                keep = det_valid[b]
                gt_mask = batch["mask"][b]
                gt = batch["labels"][b][gt_mask]
                if len(gt):
                    gt_xyxy = xywhn_to_xyxy_np(gt[:, 1:5], w=w, h=h)
                else:
                    gt_xyxy = np.zeros((0, 4), np.float32)
                h0, w0 = int(orig_hw[b, 0]), int(orig_hw[b, 1])
                sx, sy = w0 / w, h0 / h
                mapm.update(
                    preds=dict(boxes=det[b][keep][:, 2:6],
                               scores=det[b][keep][:, 1],
                               labels=det[b][keep][:, 0]),
                    targets=dict(boxes=gt_xyxy, labels=gt[:, 0]),
                    area_scale=sx * sy)
                if dump is not None:
                    scale = np.asarray([sx, sy, sx, sy], np.float32)
                    dump.add_image(image_id, w0, h0,
                                   det[b][keep][:, 2:6] * scale,
                                   det[b][keep][:, 1],
                                   det[b][keep][:, 0], gt_xyxy * scale,
                                   gt[:, 0])
                if cmat is not None:
                    cmat.update(
                        preds=dict(boxes=det[b][keep][:, 2:6],
                                   scores=det[b][keep][:, 1],
                                   labels=det[b][keep][:, 0]),
                        targets=dict(boxes=gt_xyxy, labels=gt[:, 0]))
                image_id += 1
            if not self.overlap:                # sync done — dispatch next
                try:
                    pending = start(next(it))
                except StopIteration:
                    pending = None

        if dump is not None:
            paths = dump.write(coco_dump_dir)
            print(f"=> COCO-format eval dump: {paths['results']}")
        if cmat is not None:
            cmat.save_csv(confusion_csv, class_names)
            print(f"=> confusion matrix: {confusion_csv}")
        m = mapm.compute()
        class_acc = counts[0] / (counts[1] + 1e-16)
        obj_acc = counts[2] / (counts[3] + 1e-16)
        return {
            "class_accuracy": float(class_acc),
            "obj_accuracy": float(obj_acc),
            "map50": m["map_50"],
            "map75": m["map_75"],
            "map": m["map"],
            "map_small": m.get("map_small", -1.0),
            "map_medium": m.get("map_medium", -1.0),
            "map_large": m.get("map_large", -1.0),
            "ap_per_class": m.get("ap_per_class", {}),
        }
