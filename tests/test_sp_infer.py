"""Spatially-partitioned inference (parallel/sp.py) on the virtual CPU mesh.

GSPMD shards the conv grid's row axis over a "spatial" mesh axis (XLA inserts
the halo exchanges every window op needs); results must reproduce the
single-device fused pipeline. Covers the 2-D (data, spatial) mesh, the pure-SP
1-D mesh (the bs=1 latency case), and the output-sharding contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect
from yolov5m_tpu.parallel import make_sp_infer_fn, make_sp_mesh

NC = 4
HW = 128  # P5 grid = 4 rows: n_spatial=2 keeps >= 2 rows/shard at the deepest scale


def _fused_model():
    model = YOLOv5(first_out=8, nc=NC, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, HW, HW, 3), jnp.float32))
    return model.clone(fused=True), fold_batchnorm(variables)


def _single_device(fused, variables, images, **kw):
    preds = fused.apply(variables, jnp.asarray(images), train=False)
    return jax.device_get(fused_detect(
        preds, jnp.asarray(normalized_anchors()), **kw))


def test_sp_infer_matches_single_device(rng):
    """2-D mesh: batch over "data" (2), rows over "spatial" (2)."""
    fused, variables = _fused_model()
    mesh = make_sp_mesh(n_data=2, n_spatial=2)
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=32, pre_nms_topk=64)
    infer = make_sp_infer_fn(fused, variables, normalized_anchors(), mesh, **kw)

    bs = 4
    images = rng.uniform(0, 1, (bs, HW, HW, 3)).astype(np.float32)
    det_sp, valid_sp = jax.device_get(infer(images))
    det_1, valid_1 = _single_device(fused, variables, images, **kw)

    # halo-exchanged convs compute each output pixel from the same window as
    # the unsharded program; only reduction-order noise is admissible
    np.testing.assert_array_equal(valid_sp, valid_1)
    np.testing.assert_allclose(det_sp[valid_sp], det_1[valid_1],
                               rtol=1e-4, atol=1e-4)
    assert valid_sp.any(), "degenerate test: no detections survived the gate"


def test_sp_pure_spatial_bs1(rng):
    """1-D spatial mesh, bs=1: the latency case DP cannot serve."""
    fused, variables = _fused_model()
    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("spatial",))
    kw = dict(conf_threshold=0.01, iou_threshold=0.45,
              max_detections=16, pre_nms_topk=32)
    # data_axis="data" is absent from the mesh -> module falls back to pure SP
    infer = make_sp_infer_fn(fused, variables, normalized_anchors(), mesh, **kw)

    images = rng.uniform(0, 1, (1, HW, HW, 3)).astype(np.float32)
    det_sp, valid_sp = jax.device_get(infer(images))
    det_1, valid_1 = _single_device(fused, variables, images, **kw)

    np.testing.assert_array_equal(valid_sp, valid_1)
    np.testing.assert_allclose(det_sp[valid_sp], det_1[valid_1],
                               rtol=1e-4, atol=1e-4)


def test_sp_output_batch_sharded(rng):
    """Detections leave the spatial regime: replicated over "spatial",
    sharded over "data" only."""
    fused, variables = _fused_model()
    mesh = make_sp_mesh(n_data=2, n_spatial=2)
    infer = make_sp_infer_fn(fused, variables, normalized_anchors(), mesh,
                             conf_threshold=0.01, max_detections=8,
                             pre_nms_topk=16)
    images = rng.uniform(0, 1, (2, HW, HW, 3)).astype(np.float32)
    det, valid = infer(images)
    spec = det.sharding.spec
    assert spec[0] == "data"
    assert all(s is None for s in spec[1:])
    # each batch row lives on the 2 devices of one data shard (replicated
    # across spatial), so all 4 mesh devices hold output
    assert len(det.sharding.device_set) == 4
