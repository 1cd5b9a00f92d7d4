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


def test_serving_topk_is_lossless_below_capacity(rng):
    """cfg.topk_for_conf shrinks K to 512 at serving confidence (>= 0.25).
    Whenever fewer candidates pass the gate than the smaller K, results are
    IDENTICAL to the full-capacity run — the top-k merely truncates the
    NEG_INF-padded tail. (Round-3 A/B: K=512 is ~5% faster e2e at bs=128.)"""
    from yolov5m_tpu.config import Config

    cfg = Config()
    assert cfg.topk_for_conf(0.25) == 512
    assert cfg.topk_for_conf(0.3) == 512
    assert cfg.topk_for_conf(0.01) == cfg.pre_nms_topk

    # sparse positives: ~40 gate survivors, far below both capacities
    preds = []
    for s in (8, 4, 2):
        p = rng.normal(0, 1.0, (2, 3, s, s, 12)).astype(np.float32)
        p[..., 4] = -8.0
        flat_n = 3 * s * s
        hot = rng.choice(flat_n, size=min(8, flat_n), replace=False)
        for h in hot:
            a, rem = divmod(h, s * s)
            y, x = divmod(rem, s)
            p[:, a, y, x, 4] = rng.uniform(0.5, 3.0)
        preds.append(jnp.asarray(p))
    anchors = jnp.asarray(_norm_anchors())

    out_small, valid_small = fused_detect(preds, anchors, conf_threshold=0.25,
                                          iou_threshold=0.5, pre_nms_topk=64)
    out_big, valid_big = fused_detect(preds, anchors, conf_threshold=0.25,
                                      iou_threshold=0.5, pre_nms_topk=256)
    np.testing.assert_array_equal(np.asarray(valid_small),
                                  np.asarray(valid_big))
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_big),
                               rtol=1e-6, atol=1e-6)
    assert int(np.asarray(valid_small).sum()) > 0
