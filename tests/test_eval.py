"""mAP metric tests: hand-computed golden cases + degenerate inputs."""

import numpy as np

from yolov5m_tpu.eval.metrics import MeanAveragePrecision


def _box(x1, y1, x2, y2):
    return [x1, y1, x2, y2]


def test_perfect_predictions():
    m = MeanAveragePrecision()
    boxes = np.array([_box(10, 10, 50, 50), _box(100, 100, 200, 180)])
    m.update(preds=dict(boxes=boxes, scores=[0.9, 0.8], labels=[0, 1]),
             targets=dict(boxes=boxes, labels=[0, 1]))
    r = m.compute()
    assert r["map_50"] == 1.0
    assert r["map_75"] == 1.0
    assert r["map"] == 1.0


def test_all_misses():
    m = MeanAveragePrecision()
    m.update(preds=dict(boxes=np.array([_box(0, 0, 10, 10)]), scores=[0.9],
                        labels=[0]),
             targets=dict(boxes=np.array([_box(100, 100, 200, 200)]),
                          labels=[0]))
    r = m.compute()
    assert r["map_50"] == 0.0


def test_wrong_class_is_fp():
    m = MeanAveragePrecision()
    box = np.array([_box(10, 10, 50, 50)])
    m.update(preds=dict(boxes=box, scores=[0.9], labels=[1]),
             targets=dict(boxes=box, labels=[0]))
    assert m.compute()["map_50"] == 0.0


def test_half_precision_golden():
    """2 GTs of class 0; detections: 1 TP at conf .9, 1 FP at conf .8.
    PR: (r=.5, p=1) then (r=.5, p=.5). AP = precision 1.0 up to recall .5,
    0 beyond → 101-pt AP = 51/101."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    gts = np.array([_box(0, 0, 10, 10), _box(50, 50, 60, 60)])
    dets = np.array([_box(0, 0, 10, 10), _box(200, 200, 220, 220)])
    m.update(preds=dict(boxes=dets, scores=[0.9, 0.8], labels=[0, 0]),
             targets=dict(boxes=gts, labels=[0]*2))
    np.testing.assert_allclose(m.compute()["map_50"], 51 / 101, atol=1e-6)


def test_iou_threshold_separates_50_75():
    """A detection with IoU ≈ 0.6: TP at 0.5, FP at 0.75."""
    m = MeanAveragePrecision()
    gt = np.array([_box(0, 0, 100, 100)])
    det = np.array([_box(0, 0, 100, 60)])  # iou = 0.6
    m.update(preds=dict(boxes=det, scores=[0.9], labels=[0]),
             targets=dict(boxes=gt, labels=[0]))
    r = m.compute()
    assert r["map_50"] == 1.0
    assert r["map_75"] == 0.0


def test_duplicate_detections_one_tp():
    """Two overlapping detections of the same GT: second is FP (GT taken)."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    gt = np.array([_box(0, 0, 100, 100)])
    det = np.array([_box(0, 0, 100, 100), _box(1, 1, 101, 101)])
    m.update(preds=dict(boxes=det, scores=[0.9, 0.85], labels=[0, 0]),
             targets=dict(boxes=gt, labels=[0]))
    # 1 GT: TP@conf.9 → (r=1, p=1); FP@.85 → (r=1, p=.5); AP = 1.0
    np.testing.assert_allclose(m.compute()["map_50"], 1.0, atol=1e-6)


def test_streaming_multiple_images():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    box = np.array([_box(0, 0, 10, 10)])
    # image 1: perfect; image 2: miss
    m.update(preds=dict(boxes=box, scores=[0.9], labels=[0]),
             targets=dict(boxes=box, labels=[0]))
    m.update(preds=dict(boxes=np.zeros((0, 4)), scores=[], labels=[]),
             targets=dict(boxes=box, labels=[0]))
    # 2 GT, 1 TP at top conf: precision 1 up to recall 0.5
    np.testing.assert_allclose(m.compute()["map_50"], 51 / 101, atol=1e-6)


def test_empty_everything():
    m = MeanAveragePrecision()
    assert m.compute()["map_50"] == -1.0


def test_classes_averaged():
    """class 0 perfect, class 1 all missed → mAP50 = 0.5."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    box = np.array([_box(0, 0, 10, 10)])
    far = np.array([_box(500, 500, 510, 510)])
    m.update(preds=dict(boxes=np.concatenate([box, far]), scores=[0.9, 0.8],
                        labels=[0, 1]),
             targets=dict(boxes=np.concatenate([box, box + 100]),
                          labels=[0, 1]))
    np.testing.assert_allclose(m.compute()["map_50"], 0.5, atol=1e-6)
