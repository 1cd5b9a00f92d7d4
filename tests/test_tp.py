"""Tensor-parallel (channel-sharded) execution (parallel/tp.py) on the
virtual CPU mesh.

GSPMD propagates the param channel shardings through the conv graph and
inserts the activation gathers each conv needs; results must reproduce the
single-device pipeline. Same tolerance discipline as the SP tests: channel
sharding splits the convs' input-channel reductions, so raw f32 gradients
carry reduction-order noise that Adam normalizes away — compare loss +
params + EMA + BN stats, never raw moments (tests/test_sp_train.py module
docstring has the full analysis).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.parallel import (
    make_tp_infer_fn, make_tp_mesh, make_tp_train_step)
from yolov5m_tpu.parallel.tp import variable_pspec
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    create_train_state, make_optimizer, make_train_step)

NC = 4
HW = 128


def test_variable_pspec_rule():
    """Conv kernels shard on O, per-channel vectors on dim 0, odd widths
    (the 27-channel head at nc=4) and scalars replicate."""
    n = 4
    kern = jnp.zeros((3, 3, 8, 16))
    head = jnp.zeros((1, 1, 64, 27))
    vec = jnp.zeros((16,))
    odd_vec = jnp.zeros((27,))
    scalar = jnp.zeros(())
    assert variable_pspec(kern, n, "model") == P(None, None, None, "model")
    assert variable_pspec(head, n, "model") == P()
    assert variable_pspec(vec, n, "model") == P("model")
    assert variable_pspec(odd_vec, n, "model") == P()
    assert variable_pspec(scalar, n, "model") == P()
    assert variable_pspec(3, n, "model") == P()


def _fused_model():
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    return model.clone(fused=True), fold_batchnorm(variables)


def _single_device(fused, variables, images, **kw):
    preds = fused.apply(variables, jnp.asarray(images), train=False)
    return jax.device_get(fused_detect(
        preds, jnp.asarray(normalized_anchors()), **kw))


def test_tp_infer_matches_single_device(rng):
    """2-D mesh: batch over "data" (2), channels over "model" (4)."""
    fused, variables = _fused_model()
    mesh = make_tp_mesh(n_data=2, n_model=4)
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=32, pre_nms_topk=64)
    infer = make_tp_infer_fn(fused, variables, normalized_anchors(), mesh,
                             **kw)

    bs = 4
    images = rng.uniform(0, 1, (bs, HW, HW, 3)).astype(np.float32)
    det_tp, valid_tp = jax.device_get(infer(images))
    det_1, valid_1 = _single_device(fused, variables, images, **kw)

    # channel-split convs re-order the input-channel reduction only
    np.testing.assert_array_equal(valid_tp, valid_1)
    np.testing.assert_allclose(det_tp[valid_tp], det_1[valid_1],
                               rtol=1e-4, atol=1e-4)
    assert valid_tp.any(), "degenerate test: no detections survived the gate"


def test_tp_pure_model_bs1(rng):
    """1-D model mesh, bs=1: every chip holds 1/8 of every layer's
    channels — the case neither DP (batch too small) nor SP (grid too
    small) covers."""
    fused, variables = _fused_model()
    mesh = make_tp_mesh(n_data=1, n_model=8)
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=32, pre_nms_topk=64)
    infer = make_tp_infer_fn(fused, variables, normalized_anchors(), mesh,
                             data_axis=None, **kw)

    images = rng.uniform(0, 1, (1, HW, HW, 3)).astype(np.float32)
    det_tp, valid_tp = jax.device_get(infer(images))
    det_1, valid_1 = _single_device(fused, variables, images, **kw)
    np.testing.assert_array_equal(valid_tp, valid_1)
    np.testing.assert_allclose(det_tp[valid_tp], det_1[valid_1],
                               rtol=1e-4, atol=1e-4)
    assert valid_tp.any()


def test_tp_output_is_mesh_sharded(rng):
    fused, variables = _fused_model()
    mesh = make_tp_mesh(n_data=2, n_model=4)
    infer = make_tp_infer_fn(fused, variables, normalized_anchors(), mesh,
                             conf_threshold=0.01, max_detections=16,
                             pre_nms_topk=32)
    det, valid = infer(rng.uniform(0, 1, (2, HW, HW, 3)).astype(np.float32))
    assert len(det.sharding.device_set) == 8


def test_tp_train_step_matches_single_device(rng):
    """One TP train step equals the single-device step (loss, params, EMA,
    BN stats) on a (data=2, model=4) mesh."""
    bs = 4
    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=bs,
                 compute_dtype="float32")
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)

    def fresh_state():
        return create_train_state(model, cfg, jax.random.PRNGKey(0),
                                  (HW, HW), optimizer)

    image = jnp.asarray(rng.uniform(0, 1, (bs, HW, HW, 3)).astype(np.float32))
    labels = np.zeros((bs, 8, 5), np.float32)
    labels[:, 0] = [1, 0.4, 0.6, 0.3, 0.2]
    labels[:, 1] = [2, 0.7, 0.3, 0.2, 0.4]
    mask = np.zeros((bs, 8), bool)
    mask[:, :2] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)

    ref_step = jax.jit(make_train_step(model, loss_fn, optimizer))
    ref_state, ref_metrics = ref_step(fresh_state(), image, labels, mask)

    mesh = make_tp_mesh(n_data=2, n_model=4)
    tp_step = make_tp_train_step(model, loss_fn, optimizer, mesh)
    tp_state, tp_metrics = tp_step(fresh_state(), image, labels, mask)

    np.testing.assert_allclose(float(tp_metrics["loss"]),
                               float(ref_metrics["loss"]), atol=2e-5)
    for field in ("params", "ema_params", "batch_stats"):
        fa = jax.tree.leaves(jax.device_get(getattr(tp_state, field)))
        fb = jax.tree.leaves(jax.device_get(getattr(ref_state, field)))
        assert len(fa) == len(fb)
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2.1e-3, rtol=1e-4)
