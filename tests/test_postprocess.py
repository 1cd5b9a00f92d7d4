"""Fused postprocess must match the two-stage decode+NMS pipeline exactly."""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, STRIDES
from yolov5m_tpu.ops.decode import decode_predictions
from yolov5m_tpu.ops.nms import batched_nms
from yolov5m_tpu.ops.postprocess import fused_detect


def _norm_anchors():
    a = np.asarray(ANCHORS, np.float32)
    return a / np.asarray(STRIDES, np.float32)[:, None, None]


def _preds(rng, bs=2, hw=64, nc=7):
    shapes = [(bs, 3, hw // s, hw // s, 5 + nc) for s in STRIDES]
    # spread objectness so the confidence gate has both sides
    out = []
    for s in shapes:
        p = rng.normal(0, 1.5, s).astype(np.float32)
        out.append(p)
    return [jnp.asarray(p) for p in out]


def test_fused_matches_two_stage(rng):
    preds = _preds(rng)
    anchors = jnp.asarray(_norm_anchors())

    rows = decode_predictions(preds, anchors)
    out_ref, valid_ref = batched_nms(rows, 0.5, 0.3, 300, 128)
    out_f, valid_f = fused_detect(preds, anchors, conf_threshold=0.3,
                                  iou_threshold=0.5, max_detections=300,
                                  pre_nms_topk=128)
    np.testing.assert_array_equal(np.asarray(valid_ref), np.asarray(valid_f))
    a, b = np.asarray(out_ref), np.asarray(out_f)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_fused_bf16_inputs(rng):
    preds = [p.astype(jnp.bfloat16) for p in _preds(rng)]
    anchors = jnp.asarray(_norm_anchors())
    out, valid = fused_detect(preds, anchors, conf_threshold=0.3,
                              iou_threshold=0.5, pre_nms_topk=128)
    assert out.dtype == jnp.float32
    v = np.asarray(valid)
    assert v.sum() > 0
    kept = np.asarray(out)[v]
    assert np.all(kept[:, 1] > 0.3 - 1e-3)  # conf above threshold


def test_fused_empty(rng):
    preds = [jnp.full((1, 3, s, s, 12), -20.0) for s in (8, 4, 2)]
    anchors = jnp.asarray(_norm_anchors())
    out, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                              pre_nms_topk=128)
    assert int(np.asarray(valid).sum()) == 0
