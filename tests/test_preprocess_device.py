"""On-device letterbox preprocessing vs the host (native/cv2/numpy) path."""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.data.native import letterbox
from yolov5m_tpu.ops.preprocess import (
    letterbox_geometry, letterbox_normalize, make_serving_fn)


def test_device_letterbox_matches_host(rng):
    img = rng.integers(0, 255, (100, 200, 3), np.uint8)
    host, ratio, (dw, dh) = letterbox(img, (128, 128))
    dev = np.asarray(letterbox_normalize(jnp.asarray(img[None]), (128, 128)))[0]
    r2, (dw2, dh2), _, _ = letterbox_geometry((100, 200), (128, 128))
    assert r2 == ratio[0] and (dw2, dh2) == (dw, dh)
    # same geometry: fill bands identical, content within resize-rounding
    assert np.allclose(dev[0], 114 / 255.0, atol=1e-6)
    assert np.allclose(dev[-1], 114 / 255.0, atol=1e-6)
    diff = np.abs(dev * 255.0 - host.astype(np.float32))
    assert diff.max() <= 2.0, diff.max()     # u8 rounding + resampler ULPs
    assert np.mean(diff > 1.0) < 0.02


def test_device_letterbox_no_resize_case(rng):
    """Source already at target width: pure padding, bit-exact."""
    img = rng.integers(0, 255, (64, 128, 3), np.uint8)
    host, _, _ = letterbox(img, (128, 128))
    dev = np.asarray(letterbox_normalize(jnp.asarray(img[None]), (128, 128)))[0]
    np.testing.assert_array_equal((dev * 255.0).astype(np.uint8), host)


def test_serving_fn_end_to_end(rng):
    """Raw uint8 frames → detections in original coords, one jitted graph."""
    import jax

    from yolov5m_tpu.config import Config
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.yolo import normalized_anchors

    cfg = Config(first_out=8, nc=4, image_size=128)
    model = YOLOv5(first_out=8, nc=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    serve = make_serving_fn(model, variables, jnp.asarray(normalized_anchors()),
                            src_hw=(96, 160), image_size=128,
                            conf=0.0001, pre_nms_topk=128)
    frames = rng.integers(0, 255, (2, 96, 160, 3), np.uint8)
    det, valid = serve(jnp.asarray(frames))
    det, valid = np.asarray(det), np.asarray(valid)
    assert det.shape == (2, 300, 6) and valid.shape == (2, 300)
    rows = det[valid]
    if len(rows):  # random init: boxes exist and live in source-frame bounds
        assert np.all(rows[:, 2] >= 0) and np.all(rows[:, 4] <= 160)
        assert np.all(rows[:, 3] >= 0) and np.all(rows[:, 5] <= 96)


def test_serving_fn_int8_quantized(rng):
    """The PTQ-quantized model drops into make_serving_fn unchanged and its
    detections track the fused bf16/f32 serving output."""
    import jax

    from yolov5m_tpu.models import YOLOv5, fold_batchnorm, quantize_int8
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.ops.preprocess import letterbox_normalize

    model = YOLOv5(first_out=8, nc=4, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    variables = {"params": variables["params"],
                 "batch_stats": jax.tree.map(lambda x: x + 0.01,
                                             variables["batch_stats"])}
    anchors = jnp.asarray(normalized_anchors())
    frames = rng.integers(0, 255, (2, 96, 160, 3), np.uint8)

    # calibrate on what serving actually feeds the model
    calib = [letterbox_normalize(jnp.asarray(frames), (128, 128))]
    qmodel, qvars = quantize_int8(model, variables, calib)

    fused_model = model.clone(fused=True)
    serve_ref = make_serving_fn(fused_model, fold_batchnorm(variables),
                                anchors, src_hw=(96, 160), image_size=128,
                                conf=0.0001, pre_nms_topk=128)
    serve_q = make_serving_fn(qmodel, qvars, anchors, src_hw=(96, 160),
                              image_size=128, conf=0.0001, pre_nms_topk=128)
    det_r, valid_r = (np.asarray(a) for a in serve_ref(jnp.asarray(frames)))
    det_q, valid_q = (np.asarray(a) for a in serve_q(jnp.asarray(frames)))
    assert det_q.shape == det_r.shape
    # same detection structure: counts close, and every top ref box has a
    # well-overlapping quantized box (random-init logits sit near the conf
    # threshold, so positional row comparison would be order-fragile)
    assert abs(int(valid_q.sum()) - int(valid_r.sum())) <= max(
        3, int(0.1 * valid_r.sum()))
    ref_boxes = det_r[0][valid_r[0]][:5, 2:6]
    q_boxes = det_q[0][valid_q[0]][:, 2:6]
    if len(ref_boxes) and len(q_boxes):
        from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy
        iou = np.asarray(pairwise_iou_xyxy(jnp.asarray(ref_boxes),
                                           jnp.asarray(q_boxes)))
        assert float(np.median(iou.max(axis=1))) > 0.7


def test_normalize_uint8_bf16_equals_f32_divide_for_all_codes():
    """The serving ingress normalize (u8 -> compute dtype, divide in that
    dtype) is BIT-IDENTICAL to f32 division followed by a bf16 cast for
    every possible uint8 code — the equivalence serving/server.py and
    bench.py rely on when normalizing straight to bf16 (one elementwise
    pass, half the convert-fusion traffic, ROUND4_NOTES §7)."""
    import jax.numpy as jnp
    import numpy as np
    from yolov5m_tpu.ops.preprocess import normalize_uint8

    u = jnp.arange(256, dtype=jnp.uint8)
    fast = normalize_uint8(u, jnp.bfloat16)                  # bf16 divide
    exact = (u.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
    assert fast.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(fast).view(np.uint16),
                          np.asarray(exact).view(np.uint16))
    # f32 path stays exact (uint8 -> f32 conversion is lossless)
    f32 = normalize_uint8(u, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(f32), np.arange(256, dtype=np.float32) / np.float32(255))
