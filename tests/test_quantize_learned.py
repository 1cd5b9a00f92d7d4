"""int8 PTQ agreement on a TRAINED model (committed fixture).

test_quantize.py pins numeric closeness on random weights; this checks the
quantized model against trained weight/BN-statistics distributions. The
model (first_out=8, nc=1, 128px; ~600 steps on synthetic solid rectangles)
is a COMMITTED fixture: training a toy model in-test proved unrunnably
flaky — XLA CPU scatter nondeterminism yields a different model every run,
whose quantization sensitivity itself swings (observed same-config mAP50
anywhere from 0.02 to 1.00). With fixed weights and seeded eval inputs the
whole test is deterministic; thresholds are set from measured values
(median matched IoU 0.926, median |Δscore| 0.016) with margin.

Regenerate via the training recipe in this file's git history or
ROUND2_NOTES.md if the model/quantizer ever changes incompatibly.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import serialization

from yolov5m_tpu.config import ANCHORS
from yolov5m_tpu.models import YOLOv5, fold_batchnorm, quantize_int8
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy
from yolov5m_tpu.ops.postprocess import fused_detect

HW = 128
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tiny_trained_nc1.msgpack")


def _make_batch(rng, bs, nb=4):
    img = rng.uniform(0, 0.25, (bs, HW, HW, 3)).astype(np.float32)
    labels = np.zeros((bs, nb, 5), np.float32)
    mask = np.zeros((bs, nb), bool)
    for b in range(bs):
        w, h = rng.uniform(0.3, 0.5, 2)
        cx = rng.uniform(w / 2, 1 - w / 2)
        cy = rng.uniform(h / 2, 1 - h / 2)
        x1, y1 = int((cx - w / 2) * HW), int((cy - h / 2) * HW)
        x2, y2 = int((cx + w / 2) * HW), int((cy + h / 2) * HW)
        img[b, y1:y2, x1:x2] = (0.9, 0.2, 0.2)
        labels[b, 0] = [0, cx, cy, w, h]
        mask[b, 0] = True
    return img, labels, mask


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture missing")
def test_int8_agreement_on_trained_model():
    model = YOLOv5(first_out=8, nc=1, dtype=jnp.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, HW, HW, 3)))
    with open(FIXTURE, "rb") as f:
        variables = serialization.from_bytes(
            {"params": template["params"],
             "batch_stats": template["batch_stats"]}, f.read())

    fused_model = model.clone(fused=True)
    fused_vars = fold_batchnorm(variables)
    calib = [jnp.asarray(_make_batch(np.random.default_rng(99), 8)[0])
             for _ in range(2)]
    qmodel, qvars = quantize_int8(fused_model, fused_vars, calib)
    anchors = jnp.asarray(normalized_anchors())

    ious, dscores = [], []
    vr = np.random.default_rng(123)
    for _ in range(2):
        img, _, _ = _make_batch(vr, 8)
        pf = fused_model.apply(fused_vars, jnp.asarray(img), train=False)
        pq = qmodel.apply(qvars, jnp.asarray(img), train=False)
        df, vf = fused_detect(pf, anchors, conf_threshold=0.01,
                              iou_threshold=0.45, pre_nms_topk=256)
        dq, vq = fused_detect(pq, anchors, conf_threshold=0.01,
                              iou_threshold=0.45, pre_nms_topk=256)
        df, vf, dq, vq = map(np.asarray, (df, vf, dq, vq))
        for b in range(img.shape[0]):
            top = df[b][vf[b]][:5]
            qd = dq[b][vq[b]]
            if not len(top) or not len(qd):
                continue
            iou = np.asarray(pairwise_iou_xyxy(jnp.asarray(top[:, 2:6]),
                                               jnp.asarray(qd[:, 2:6])))
            best = iou.argmax(axis=1)
            ious.extend(iou.max(axis=1).tolist())
            dscores.extend(np.abs(top[:, 1] - qd[best, 1]).tolist())

    ious = np.asarray(ious)
    dscores = np.asarray(dscores)
    assert len(ious) >= 40, f"too few detections compared ({len(ious)})"
    # measured on this fixture: median IoU 0.926, median |dscore| 0.016
    assert np.median(ious) > 0.85, np.sort(ious)[:10]
    assert ious.min() > 0.25, ious.min()
    assert np.median(dscores) < 0.05, np.median(dscores)
