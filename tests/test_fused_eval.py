"""Fused (BN-folded, on-device) eval graph parity.

The Evaluator folds BatchNorm into the convs inside its jitted eval graph
(models/fuse.py fold_batchnorm_device) so validation runs the BN-free fused
model. Folding is mathematically exact; these tests pin that the fused and
unfused evaluators agree on a real YOLOv5 model, and that the traceable fold
matches the host-side fold used for deployment (models/fuse.py
fold_batchnorm).
"""

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.eval import Evaluator
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm, fold_batchnorm_device
from yolov5m_tpu.models.yolo import normalized_anchors

HW = 128


def _init_model(rng_seed=0):
    model = YOLOv5(first_out=8, nc=4)
    variables = model.init(jax.random.PRNGKey(rng_seed),
                           jnp.zeros((1, HW, HW, 3)))
    # perturb batch_stats away from init (mean 0 / var 1) so folding is
    # actually exercised, not a no-op
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda x: x + 0.05 * jnp.arange(x.size, dtype=x.dtype
                                            ).reshape(x.shape) / x.size,
            variables["batch_stats"]),
    }
    return model, variables


def test_device_fold_matches_host_fold():
    model, variables = _init_model()
    host = fold_batchnorm(variables)
    dev = jax.jit(fold_batchnorm_device)(variables)
    flat_h = jax.tree_util.tree_leaves_with_path(host)
    flat_d = jax.tree_util.tree_leaves_with_path(dev)
    assert len(flat_h) == len(flat_d)
    for (ph, lh), (pd, ld) in zip(flat_h, flat_d):
        assert ph == pd
        np.testing.assert_allclose(np.asarray(lh), np.asarray(ld),
                                   rtol=1e-5, atol=1e-6)


def test_fused_and_unfused_evaluator_agree():
    model, variables = _init_model()
    cfg = Config(first_out=8, nc=4, image_size=HW, conf_threshold=0.01,
                 pre_nms_topk=128)

    rng = np.random.default_rng(7)
    bs, nb = 2, 4
    labels = np.zeros((bs, nb, 5), np.float32)
    mask = np.zeros((bs, nb), bool)
    for b in range(bs):
        for k in range(3):
            cx, cy = rng.uniform(0.25, 0.75, 2)
            w, h = rng.uniform(0.1, 0.3, 2)
            labels[b, k] = [rng.integers(0, 4), cx, cy, w, h]
            mask[b, k] = True
    batch = {"image": rng.uniform(size=(bs, HW, HW, 3)).astype(np.float32),
             "labels": labels, "mask": mask}

    class _Loader:
        def __iter__(self):
            return iter([batch])

    anchors_px = np.asarray(ANCHORS, np.float32)
    ev_fused = Evaluator(model, normalized_anchors(), cfg, anchors_px,
                         fused_eval=True)
    ev_plain = Evaluator(model, normalized_anchors(), cfg, anchors_px,
                         fused_eval=False)
    assert ev_fused._fused_model is not None
    assert ev_plain._fused_model is None

    r_fused = ev_fused.run(variables, _Loader())
    r_plain = ev_plain.run(variables, _Loader())
    for key in ("map50", "map75", "map", "class_accuracy", "obj_accuracy"):
        assert abs(r_fused[key] - r_plain[key]) < 1e-5, (key, r_fused, r_plain)
