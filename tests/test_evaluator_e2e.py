"""End-to-end Evaluator validation with analytically-inverted predictions.

Head logits are constructed so the decode path reproduces the ground-truth
boxes exactly (inverting xy=(2σ+g-0.5)s and wh=(2σ)²a) at every scale's
assigned cell; the evaluator must then report mAP50 = 1.0 and full
accuracies. Catches wiring bugs across decode, NMS, accuracy counting, and
mAP matching that unit tests can miss.
"""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.eval import Evaluator
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.train.targets import anchor_iou_all

HW = 128
NC = 4
STRIDES = (8, 16, 32)

# deterministic, well-separated boxes (class, cx, cy, w, h) — chosen so no
# two boxes share a (scale, anchor, cell) assignment (asserted below)
BOXES = [
    [1, 0.20, 0.20, 0.10, 0.12],
    [3, 0.70, 0.30, 0.22, 0.30],
    [0, 0.40, 0.75, 0.45, 0.35],
]


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def _build_preds_for_labels(labels, mask, nc=NC):
    """Head outputs whose decode equals the labels exactly, at every scale."""
    anchors_px = np.asarray(ANCHORS, np.float32)
    bs = labels.shape[0]
    preds = [np.full((bs, 3, HW // s, HW // s, 5 + nc), -12.0, np.float32)
             for s in STRIDES]
    written = set()
    for b in range(bs):
        for k in range(labels.shape[1]):
            if not mask[b, k]:
                continue
            cls, cx, cy, w, h = labels[b, k]
            iou = np.asarray(anchor_iou_all(jnp.asarray([w, h]),
                                            jnp.asarray(anchors_px)))
            for s_idx, stride in enumerate(STRIDES):
                a_idx = int(iou[s_idx].argmax())
                ny = nx = HW // stride
                gx, gy = cx * nx, cy * ny
                j, i = int(gx), int(gy)
                key = (b, s_idx, a_idx, i, j)
                assert key not in written, f"cell collision {key}"
                written.add(key)
                aw, ah = anchors_px[s_idx, a_idx]
                sw = np.sqrt(w * HW / aw) / 2
                sh = np.sqrt(h * HW / ah) / 2
                assert 0 < sw < 1 and 0 < sh < 1, "box too large for anchor"
                row = preds[s_idx][b, a_idx, i, j]
                row[0] = _logit((gx - j + 0.5) / 2)
                row[1] = _logit((gy - i + 0.5) / 2)
                row[2], row[3] = _logit(sw), _logit(sh)
                row[4] = 12.0                       # objectness ≈ 1
                row[5 + int(cls)] = 12.0            # one-hot class
    return [jnp.asarray(p) for p in preds]


class _FixedModel:
    """Stands in for the flax model inside Evaluator: returns canned preds."""

    def __init__(self, preds):
        self.preds = preds

    def apply(self, variables, image, train=False):
        return self.preds


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        return iter([self.batch])


def _make_batch(bs=2):
    nb = 6
    labels = np.zeros((bs, nb, 5), np.float32)
    mask = np.zeros((bs, nb), bool)
    for b in range(bs):
        for k, row in enumerate(BOXES):
            labels[b, k] = row
            mask[b, k] = True
    return labels, mask


def test_perfect_predictions_give_perfect_map():
    labels, mask = _make_batch()
    preds = _build_preds_for_labels(labels, mask)
    cfg = Config(first_out=8, nc=NC, image_size=HW, conf_threshold=0.1,
                 pre_nms_topk=128)
    evaluator = Evaluator(_FixedModel(preds), normalized_anchors(), cfg,
                          np.asarray(ANCHORS, np.float32))
    batch = {"image": np.zeros((labels.shape[0], HW, HW, 3), np.float32),
             "labels": labels, "mask": mask}
    results = evaluator.run({}, _OneBatchLoader(batch))

    assert results["map50"] == 1.0, results
    assert results["map75"] > 0.99, results
    assert results["class_accuracy"] > 0.99, results
    assert results["obj_accuracy"] > 0.99, results


def test_shifted_ground_truth_degrades_map():
    """Evaluating exact predictions against shifted GT must drop map75."""
    labels, mask = _make_batch(bs=1)
    preds = _build_preds_for_labels(labels, mask)
    shifted = labels.copy()
    shifted[0, :3, 1] += 0.04  # shift GT centers
    cfg = Config(first_out=8, nc=NC, image_size=HW, conf_threshold=0.1,
                 pre_nms_topk=128)
    evaluator = Evaluator(_FixedModel(preds), normalized_anchors(), cfg,
                          np.asarray(ANCHORS, np.float32))
    batch = {"image": np.zeros((1, HW, HW, 3), np.float32),
             "labels": shifted, "mask": mask}
    results = evaluator.run({}, _OneBatchLoader(batch))
    assert results["map75"] < 1.0
