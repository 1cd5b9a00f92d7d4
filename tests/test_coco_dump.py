"""COCO-format eval dump (eval/coco_dump.py + Evaluator coco_dump_dir).

Round-trip: re-scoring the dumped annotations.json/results.json with our own
MeanAveragePrecision must reproduce the directly computed metrics exactly —
the dump is a lossless externalization of what the evaluator scored. When
pycocotools is importable (not in this image), COCOeval runs on the same
files as an external parity check.
"""

import json

import numpy as np
import pytest

from yolov5m_tpu.eval.coco_dump import CocoDump
from yolov5m_tpu.eval.metrics import MeanAveragePrecision


def _synthetic_images(rng, n_images=6, nc=4):
    per_image = []
    for _ in range(n_images):
        m = rng.integers(1, 5)
        gt = np.concatenate([
            rng.uniform(0, 300, (m, 2)),
            rng.uniform(320, 640, (m, 2))], axis=1).astype(np.float32)
        gt_labels = rng.integers(0, nc, m)
        # predictions: jittered GT + noise boxes
        pred = gt + rng.normal(0, 8, gt.shape).astype(np.float32)
        scores = rng.uniform(0.3, 1.0, m).astype(np.float32)
        labels = gt_labels.copy()
        k = rng.integers(0, 3)
        noise = np.concatenate([
            rng.uniform(0, 300, (k, 2)),
            rng.uniform(320, 640, (k, 2))], axis=1).astype(np.float32)
        pred = np.concatenate([pred, noise])
        scores = np.concatenate([scores, rng.uniform(0.05, 0.4, k)]).astype(np.float32)
        labels = np.concatenate([labels, rng.integers(0, nc, k)])
        per_image.append((pred, scores, labels, gt, gt_labels))
    return per_image


def _score_from_dump(ann_path, res_path):
    with open(ann_path) as f:
        ann = json.load(f)
    with open(res_path) as f:
        res = json.load(f)
    by_img_gt = {im["id"]: ([], []) for im in ann["images"]}
    for a in ann["annotations"]:
        x, y, w, h = a["bbox"]
        by_img_gt[a["image_id"]][0].append([x, y, x + w, y + h])
        by_img_gt[a["image_id"]][1].append(a["category_id"])
    by_img_dt = {im["id"]: ([], [], []) for im in ann["images"]}
    for r in res:
        x, y, w, h = r["bbox"]
        by_img_dt[r["image_id"]][0].append([x, y, x + w, y + h])
        by_img_dt[r["image_id"]][1].append(r["score"])
        by_img_dt[r["image_id"]][2].append(r["category_id"])
    mapm = MeanAveragePrecision()
    for img_id in by_img_gt:
        gt_boxes, gt_labels = by_img_gt[img_id]
        boxes, scores, labels = by_img_dt[img_id]
        mapm.update(
            preds=dict(boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
                       scores=np.asarray(scores, np.float32),
                       labels=np.asarray(labels)),
            targets=dict(boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 4),
                         labels=np.asarray(gt_labels)))
    return mapm.compute()


def test_dump_roundtrip_reproduces_metrics(tmp_path, rng):
    per_image = _synthetic_images(rng)
    mapm = MeanAveragePrecision()
    dump = CocoDump(class_names=["a", "b", "c", "d"])
    for i, (pred, scores, labels, gt, gt_labels) in enumerate(per_image):
        mapm.update(preds=dict(boxes=pred, scores=scores, labels=labels),
                    targets=dict(boxes=gt, labels=gt_labels))
        dump.add_image(i, 640, 640, pred, scores, labels, gt, gt_labels)
    paths = dump.write(str(tmp_path))

    direct = mapm.compute()
    redumped = _score_from_dump(paths["annotations"], paths["results"])
    for key in ("map", "map_50", "map_75"):
        assert abs(direct[key] - redumped[key]) < 1e-9, key

    # structural checks on the files
    with open(paths["annotations"]) as f:
        ann = json.load(f)
    assert {c["name"] for c in ann["categories"]} <= {"a", "b", "c", "d"}
    assert all(a["iscrowd"] == 0 and a["area"] > 0 for a in ann["annotations"])


def test_pycocotools_scores_dump_if_available(tmp_path, rng):
    pytest.importorskip("pycocotools.coco")
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    per_image = _synthetic_images(rng)
    mapm = MeanAveragePrecision(max_det=100)
    dump = CocoDump()
    for i, (pred, scores, labels, gt, gt_labels) in enumerate(per_image):
        mapm.update(preds=dict(boxes=pred, scores=scores, labels=labels),
                    targets=dict(boxes=gt, labels=gt_labels))
        dump.add_image(i, 640, 640, pred, scores, labels, gt, gt_labels)
    paths = dump.write(str(tmp_path))

    coco = COCO(paths["annotations"])
    ev = COCOeval(coco, coco.loadRes(paths["results"]), "bbox")
    ev.params.areaRng = [[0, 1e10]]
    ev.params.areaRngLbl = ["all"]
    ev.evaluate(); ev.accumulate(); ev.summarize()
    ours = mapm.compute()
    assert abs(ev.stats[0] - ours["map"]) < 0.01
