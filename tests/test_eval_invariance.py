"""Eval correctness invariants around batch padding and epoch seeding.

The reference yields a smaller final val batch (its DataLoader default); our
fixed-shape loader instead pads the final short batch and must mark the
padding invalid so no image is ever double-counted in mAP/accuracy. The
headline test here: identical metrics for bs=1 vs bs=7 over a 13-image
synthetic set (13 = 7 + 6, forcing one padded row).

Predictions are batch-independent by construction: a stand-in model selects
canned per-image head outputs by an image id encoded in the pixel values, so
any metric difference between batch sizes can only come from the evaluator's
batching/padding logic.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.data.dataset import BatchLoader, DetectionDataset
from yolov5m_tpu.eval import Evaluator
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.train.targets import anchor_iou_all

HW = 128
NC = 4
STRIDES = (8, 16, 32)
N_IMAGES = 13


def _logit(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def _image_labels(i):
    """Per-image (n, 5) float64 labels (cls, cx, cy, w, h), normalized.

    Anchor-fit and cell-collision-free at HW=128 (same geometry family as
    tests/test_evaluator_e2e.py), jittered per image so every image has its
    own distinct boxes."""
    d = (i % 5) * 0.008
    return np.array([
        [1, 0.20 + d, 0.20, 0.10, 0.12],
        [3, 0.70 - d, 0.30, 0.22, 0.30],
        [(i % NC), 0.40, 0.75 + d, 0.45, 0.35],
    ], np.float64)


@pytest.fixture
def eval_dataset(tmp_path):
    """13 constant-pixel PNGs (pixel value == image id) + yolo txt labels."""
    os.makedirs(tmp_path / "images" / "val")
    os.makedirs(tmp_path / "labels" / "val")
    for i in range(N_IMAGES):
        img = np.full((HW, HW, 3), i, np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / "val" / f"img{i:02d}.png")
        rows = _image_labels(i)
        (tmp_path / "labels" / "val" / f"img{i:02d}.txt").write_text(
            "\n".join(" ".join("%.10g" % v for v in r) for r in rows))
    return str(tmp_path)


def _build_preds_by_id():
    """(n_images, 3, ny, nx, 5+nc) canned head outputs per scale whose decode
    reproduces each image's GT exactly."""
    anchors_px = np.asarray(ANCHORS, np.float32)
    preds = [np.full((N_IMAGES, 3, HW // s, HW // s, 5 + NC), -12.0, np.float32)
             for s in STRIDES]
    for b in range(N_IMAGES):
        written = set()
        for cls, cx, cy, w, h in _image_labels(b).astype(np.float32):
            iou = np.asarray(anchor_iou_all(jnp.asarray([w, h]),
                                            jnp.asarray(anchors_px)))
            for s_idx, stride in enumerate(STRIDES):
                a_idx = int(iou[s_idx].argmax())
                ny = nx = HW // stride
                gx, gy = cx * nx, cy * ny
                j, i = int(gx), int(gy)
                key = (s_idx, a_idx, i, j)
                assert key not in written, f"cell collision {key}"
                written.add(key)
                aw, ah = anchors_px[s_idx, a_idx]
                sw = np.sqrt(w * HW / aw) / 2
                sh = np.sqrt(h * HW / ah) / 2
                assert 0 < sw < 1 and 0 < sh < 1
                row = preds[s_idx][b, a_idx, i, j]
                row[0] = _logit((gx - j + 0.5) / 2)
                row[1] = _logit((gy - i + 0.5) / 2)
                row[2], row[3] = _logit(sw), _logit(sh)
                row[4] = 12.0
                row[5 + int(cls)] = 12.0
    return [jnp.asarray(p) for p in preds]


class _IdSelectModel:
    """Returns canned per-image preds selected by the pixel-encoded image id.

    Batch-composition-independent by construction; a zero-padded row selects
    image 0's preds — if the evaluator ever counts padding, metrics shift."""

    def __init__(self, preds_all):
        self.preds_all = preds_all

    def apply(self, variables, image, train=False):
        ids = jnp.clip(jnp.round(image[:, 0, 0, 0] * 255.0).astype(jnp.int32),
                       0, self.preds_all[0].shape[0] - 1)
        return [jnp.take(p, ids, axis=0) for p in self.preds_all]


def _run_eval(dataset_root, bs):
    ds = DetectionDataset(dataset_root, train=False, default_size=HW,
                          bs=bs, bboxes_format="yolo", max_boxes=8)
    loader = BatchLoader(ds, bs, shuffle=False, drop_last=False)
    cfg = Config(first_out=8, nc=NC, image_size=HW, conf_threshold=0.1,
                 pre_nms_topk=128)
    evaluator = Evaluator(_IdSelectModel(_build_preds_by_id()),
                          normalized_anchors(), cfg,
                          np.asarray(ANCHORS, np.float32))
    return evaluator.run({}, loader)


def test_map_identical_bs1_vs_bs7(eval_dataset):
    """13 images, bs=7 → final batch has one padded row; metrics must equal
    the bs=1 run exactly (the old wrap-around padding double-counted)."""
    r1 = _run_eval(eval_dataset, 1)
    r7 = _run_eval(eval_dataset, 7)
    for k in ("map50", "map75", "map", "class_accuracy", "obj_accuracy"):
        assert r1[k] == pytest.approx(r7[k], abs=1e-9), (k, r1[k], r7[k])
    # and the predictions are exact inversions, so mAP is perfect
    assert r7["map50"] == 1.0


def test_short_batch_padding_marked_invalid(eval_dataset):
    ds = DetectionDataset(eval_dataset, train=False, default_size=HW,
                          bs=7, bboxes_format="yolo", max_boxes=8)
    loader = BatchLoader(ds, 7, shuffle=False, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    last = batches[1]
    assert last["image"].shape[0] == 7           # fixed batch shape kept
    np.testing.assert_array_equal(last["image_valid"],
                                  [True] * 6 + [False])
    assert not last["mask"][6].any()             # padded row has no labels
    assert np.all(last["image"][6] == 0.0)       # padded row is blank
    assert batches[0]["image_valid"].all()
