"""DP batch inference (parallel/infer.py) on the virtual 8-device CPU mesh:
sharded serving must reproduce the single-device fused pipeline exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.parallel import make_dp_infer_fn, make_mesh, shard_batch

NC = 4
HW = 64


def _fused_model():
    cfg = Config(first_out=8, nc=NC, image_size=HW)
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    return model.clone(fused=True), fold_batchnorm(variables), cfg


def test_dp_infer_matches_single_device(rng):
    fused, variables, cfg = _fused_model()
    anchors = normalized_anchors()
    mesh = make_mesh(8)
    infer = make_dp_infer_fn(fused, variables, anchors, mesh,
                             conf_threshold=0.01, iou_threshold=0.45,
                             max_detections=32, pre_nms_topk=64)

    bs = 16  # 2 images per device
    images = rng.uniform(0, 1, (bs, HW, HW, 3)).astype(np.float32)
    sharded_images = shard_batch({"image": images}, mesh)["image"]
    det_dp, valid_dp = jax.device_get(infer(sharded_images))

    preds = fused.apply(variables, jnp.asarray(images), train=False)
    det_1, valid_1 = jax.device_get(fused_detect(
        preds, jnp.asarray(anchors), conf_threshold=0.01, iou_threshold=0.45,
        max_detections=32, pre_nms_topk=64))

    # batch-parallel with no cross-device math: results must match to f32
    # reduction-order noise (CPU backend: identical op decomposition)
    np.testing.assert_array_equal(valid_dp, valid_1)
    np.testing.assert_allclose(det_dp[valid_dp], det_1[valid_1],
                               rtol=1e-5, atol=1e-5)
    assert valid_dp.any(), "degenerate test: no detections survived the gate"


def test_dp_infer_output_is_batch_sharded(rng):
    fused, variables, cfg = _fused_model()
    mesh = make_mesh(8)
    infer = make_dp_infer_fn(fused, variables, normalized_anchors(), mesh,
                             conf_threshold=0.01, max_detections=8,
                             pre_nms_topk=16)
    images = rng.uniform(0, 1, (8, HW, HW, 3)).astype(np.float32)
    det, valid = infer(shard_batch({"image": images}, mesh)["image"])
    # one batch row per device, no gather to a single device
    assert len(det.sharding.device_set) == 8
    assert det.sharding.shard_shape(det.shape)[0] == 1
