"""Golden-value tests for the geometry library.

Goldens are computed with independent numpy implementations of the reference
formulas (reference utils/bboxes_utils.py; utils/utils.py:151-181), plus a few
hand-computed cases, so the tests do not depend on /root/reference being
importable.
"""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.ops import (
    iou_wh, box_iou, coco_to_yolo, xywh_to_xyxy, xyxy_to_xywh,
    xywhn_to_xyxy, xyxy_to_xywhn, clip_boxes, rescale_boxes,
)
from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy


def np_iou_corners(a, b, giou=False, eps=1e-7):
    """Independent numpy (G)IoU on corner boxes for golden comparison."""
    ix = np.clip(np.minimum(a[..., 2], b[..., 2]) - np.maximum(a[..., 0], b[..., 0]), 0, None)
    iy = np.clip(np.minimum(a[..., 3], b[..., 3]) - np.maximum(a[..., 1], b[..., 1]), 0, None)
    inter = ix * iy
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = area_a + area_b - inter + eps
    iou = inter / union
    if giou:
        cw = np.maximum(a[..., 2], b[..., 2]) - np.minimum(a[..., 0], b[..., 0])
        ch = np.maximum(a[..., 3], b[..., 3]) - np.minimum(a[..., 1], b[..., 1])
        c = cw * ch + eps
        return iou - (c - union) / c
    return iou


def test_iou_wh_hand_computed():
    # gt 4x4 vs anchor 2x8: inter = min(4,2)*min(4,8) = 8; union = 16+16-8 = 24
    got = iou_wh(jnp.array([4.0, 4.0]), jnp.array([2.0, 8.0]))
    assert np.isclose(float(got), 8 / 24)
    # identical boxes → 1
    assert np.isclose(float(iou_wh(jnp.array([3.0, 5.0]), jnp.array([3.0, 5.0]))), 1.0)


def test_iou_wh_broadcasts_over_anchors():
    anchors = jnp.array([[10, 13], [16, 30], [33, 23]], jnp.float32)
    gt = jnp.array([16.0, 30.0])
    got = np.asarray(iou_wh(gt, anchors))
    expected = []
    for a in np.asarray(anchors):
        inter = min(16, a[0]) * min(30, a[1])
        expected.append(inter / (16 * 30 + a[0] * a[1] - inter))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_box_iou_corners_matches_numpy(rng):
    a = rng.uniform(0, 600, (64, 4)).astype(np.float32)
    b = rng.uniform(0, 600, (64, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])  # ensure x2>=x1
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b), box_format="corners"))[:, 0]
    np.testing.assert_allclose(got, np_iou_corners(a, b), rtol=1e-5, atol=1e-6)


def test_box_iou_giou_matches_numpy(rng):
    a = rng.uniform(10, 300, (32, 4)).astype(np.float32)  # midpoint format
    b = rng.uniform(10, 300, (32, 4)).astype(np.float32)
    got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b), giou=True))[:, 0]
    ac = np.concatenate([a[:, :2] - a[:, 2:] / 2, a[:, :2] + a[:, 2:] / 2], -1)
    bc = np.concatenate([b[:, :2] - b[:, 2:] / 2, b[:, :2] + b[:, 2:] / 2], -1)
    np.testing.assert_allclose(got, np_iou_corners(ac, bc, giou=True), rtol=1e-5, atol=1e-6)


def test_giou_identity_and_disjoint():
    box = jnp.array([[100.0, 100.0, 50.0, 50.0]])
    assert np.isclose(float(box_iou(box, box, giou=True)[0, 0]), 1.0, atol=1e-6)
    far = jnp.array([[500.0, 500.0, 50.0, 50.0]])
    # disjoint: iou 0, GIoU negative
    assert float(box_iou(box, far, giou=True)[0, 0]) < 0


def test_coco_to_yolo_golden():
    # box (x1=10, y1=20, w=100, h=50) in a 640x640 image
    got = np.asarray(coco_to_yolo(jnp.array([[10.0, 20.0, 100.0, 50.0]])))
    np.testing.assert_allclose(got[0], [60 / 640, 45 / 640, 100 / 640, 50 / 640], rtol=1e-6)


def test_xywh_xyxy_roundtrip(rng):
    boxes = rng.uniform(50, 500, (100, 4)).astype(np.float32)
    back = np.asarray(xyxy_to_xywh(xywh_to_xyxy(jnp.asarray(boxes))))
    np.testing.assert_allclose(back, boxes, rtol=1e-5)


def test_xywhn_xyxy_golden():
    got = np.asarray(xywhn_to_xyxy(jnp.array([[0.5, 0.5, 0.25, 0.5]]), w=640, h=640))
    np.testing.assert_allclose(got[0], [240, 160, 400, 480], rtol=1e-6)
    back = np.asarray(xyxy_to_xywhn(jnp.array([[240.0, 160, 400, 480]]), w=640, h=640))
    np.testing.assert_allclose(back[0], [0.5, 0.5, 0.25, 0.5], rtol=1e-6)


def test_clip_boxes():
    got = np.asarray(clip_boxes(jnp.array([[-5.0, -10, 700, 300]]), (480, 640)))
    np.testing.assert_allclose(got[0], [0, 0, 640, 300])


def test_rescale_boxes_floor_truncation():
    # reference truncates to 2 decimals via floor(x*100)/100 (bboxes_utils.py:121-124)
    got = np.asarray(rescale_boxes(jnp.array([[100.0, 100.0, 200.0, 200.0]]),
                                   (640, 640), (333, 333)))
    expected = np.floor(np.array([100, 100, 200, 200]) * (333 / 640) * 100) / 100
    np.testing.assert_allclose(got[0], expected, rtol=1e-6)


def test_pairwise_iou(rng):
    a = np.abs(rng.uniform(0, 300, (16, 4))).astype(np.float32)
    b = np.abs(rng.uniform(0, 300, (24, 4))).astype(np.float32)
    a[:, 2:] = a[:, :2] + np.abs(a[:, 2:])
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:])
    got = np.asarray(pairwise_iou_xyxy(jnp.asarray(a), jnp.asarray(b)))
    exp = np_iou_corners(a[:, None, :], b[None, :, :])
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_diou_ciou_properties():
    """DIoU/CIoU sanity: equal boxes → 1; both ≤ IoU; CIoU ≤ DIoU for
    mismatched aspect ratios."""
    a = jnp.array([[100.0, 100.0, 40.0, 20.0]])
    assert np.isclose(float(box_iou(a, a, ciou=True)[0, 0]), 1.0, atol=1e-5)
    assert np.isclose(float(box_iou(a, a, diou=True)[0, 0]), 1.0, atol=1e-5)
    b = jnp.array([[120.0, 110.0, 20.0, 40.0]])  # offset + rotated aspect
    iou = float(box_iou(a, b)[0, 0])
    diou = float(box_iou(a, b, diou=True)[0, 0])
    ciou = float(box_iou(a, b, ciou=True)[0, 0])
    assert diou < iou
    assert ciou < diou  # aspect term adds penalty here


def test_ciou_loss_differentiable():
    import jax
    from yolov5m_tpu.config import ANCHORS
    from yolov5m_tpu.train.loss import LossConfig, YoloLoss
    rng_np = np.random.default_rng(0)
    preds = [jnp.asarray(rng_np.normal(size=(1, 3, 8, 8, 10)).astype(np.float32)),
             jnp.asarray(rng_np.normal(size=(1, 3, 4, 4, 10)).astype(np.float32)),
             jnp.asarray(rng_np.normal(size=(1, 3, 2, 2, 10)).astype(np.float32))]
    labels = jnp.asarray([[[1, .5, .5, .2, .3]]], jnp.float32)
    mask = jnp.ones((1, 1), bool)
    loss_fn = YoloLoss(LossConfig(nc=5, iou_type="ciou"),
                       np.asarray(ANCHORS, np.float32))
    val, grads = jax.value_and_grad(
        lambda ps: loss_fn(ps, labels, mask)[0])(preds)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)


def test_unletterbox_np_matches_jnp(rng):
    """The numpy twin serving/server.py uses per request must be exactly
    the device version's math (same clip/pad/ratio geometry)."""
    from yolov5m_tpu.ops.boxes import unletterbox_boxes, unletterbox_boxes_np

    boxes = rng.uniform(0, 640, (17, 4)).astype(np.float32)
    for ratio, dwdh, orig_hw in (((0.5, 0.5), (16.0, 0.0), (720, 1280)),
                                 (0.33, (0.0, 140.0), (1080, 1920)),
                                 ((1.0, 1.0), (0.0, 0.0), (640, 640))):
        a = np.asarray(unletterbox_boxes(jnp.asarray(boxes), ratio, dwdh,
                                         orig_hw))
        b = unletterbox_boxes_np(boxes, ratio, dwdh, orig_hw)
        np.testing.assert_allclose(a, b, rtol=1e-6)
