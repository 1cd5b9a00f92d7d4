"""Detection confusion matrix (eval/confusion.py)."""

import numpy as np

from yolov5m_tpu.eval.confusion import ConfusionMatrix


def _b(x, y, s=40):
    return [x, y, x + s, y + s]


def test_confusion_matrix_cells():
    cm = ConfusionMatrix(nc=3)
    # image: GT classes [0, 1, 2]; predictions: class0 correct, class1
    # predicted as class2 (cross-class confusion), class2 missed, plus one
    # false alarm of class1 in empty space, plus one low-conf det (dropped)
    gt = np.array([_b(0, 0), _b(100, 100), _b(200, 200)], np.float32)
    gl = np.array([0, 1, 2])
    pred = np.array([_b(2, 2), _b(101, 99), _b(400, 400), _b(3, 1)],
                    np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.1], np.float32)
    pl = np.array([0, 2, 1, 1])
    cm.update(preds=dict(boxes=pred, scores=scores, labels=pl),
              targets=dict(boxes=gt, labels=gl))

    bg = cm.background
    assert cm.matrix[0, 0] == 1          # correct class 0
    assert cm.matrix[2, 1] == 1          # GT 1 predicted as 2
    assert cm.matrix[bg, 2] == 1         # GT 2 missed
    assert cm.matrix[1, bg] == 1         # class-1 false alarm
    assert cm.matrix.sum() == 4          # low-conf det dropped entirely

    pc = cm.per_class()
    np.testing.assert_array_equal(pc["tp"], [1, 0, 0])
    np.testing.assert_array_equal(pc["fp"], [0, 1, 1])
    np.testing.assert_array_equal(pc["fn"], [0, 1, 1])


def test_greedy_matching_prefers_best_iou():
    cm = ConfusionMatrix(nc=2)
    gt = np.array([_b(0, 0)], np.float32)
    # two dets overlap the GT; the higher-IoU one (exact) must claim it even
    # though the other has higher score
    pred = np.array([_b(10, 10), _b(0, 0)], np.float32)
    scores = np.array([0.99, 0.5], np.float32)
    pl = np.array([1, 0])
    cm.update(preds=dict(boxes=pred, scores=scores, labels=pl),
              targets=dict(boxes=gt, labels=np.array([0])))
    assert cm.matrix[0, 0] == 1          # exact det (class 0) matched
    assert cm.matrix[1, cm.background] == 1


def test_csv_dump(tmp_path):
    cm = ConfusionMatrix(nc=2)
    cm.update(preds=dict(boxes=np.array([_b(0, 0)], np.float32),
                         scores=np.array([0.9], np.float32),
                         labels=np.array([1])),
              targets=dict(boxes=np.array([_b(0, 0)], np.float32),
                           labels=np.array([1])))
    out = tmp_path / "cm.csv"
    cm.save_csv(str(out), class_names=["car", "person"])
    text = out.read_text().splitlines()
    assert text[0].startswith("pred\\true,car,person,background")
    assert len(text) == 4
