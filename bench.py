"""Headline benchmark: 640x640 batch inference images/sec/chip including NMS.

Matches the north-star metric (BASELINE.json): YOLOv5m (first_out=48, 80
classes) forward + decode + class-aware NMS, all on-device in one jit.
`vs_baseline` is the ratio against the 2x-A100 target: we take ~300 img/s as
a plain-PyTorch A100 yolov5m 640 batch-inference figure, so target = 600
img/s and vs_baseline = value / 600 (>1.0 beats the target).

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

A100_TARGET_IMG_S = 600.0  # 2x ~300 img/s (plain-torch A100 yolov5m batch inference)


def main(batch_size: int = 64, iters: int = 24, warmup: int = 1) -> None:
    # persistent compile cache: repeated bench runs (the driver's included)
    # skip the multi-minute remote compile of the full pipeline
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = fold_batchnorm(
        base.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32)))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    @jax.jit
    def infer(v, x):
        preds = model.apply(v, x, train=False)
        return fused_detect(preds, anchors, conf_threshold=0.25,
                            iou_threshold=cfg.nms_iou_thresh,
                            max_detections=cfg.max_detections,
                            pre_nms_topk=cfg.pre_nms_topk)

    # distinct device-resident batches: repeated identical executions can be
    # result-cached by remote-execution relays, inflating throughput.
    # Generated on device — host→device uploads of many 640³ batches are
    # slow over tunneled transports.
    gen = jax.jit(lambda k: jax.random.uniform(
        k, (batch_size, 640, 640, 3), jnp.float32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
    jax.block_until_ready(xs)

    for i in range(warmup * len(xs)):
        det, valid = infer(variables, xs[i % len(xs)])
    det.block_until_ready()

    # adapt the iteration count to current device speed so the bench always
    # finishes (the tunneled chip has been observed degraded 50x for hours)
    t0 = time.perf_counter()
    det, valid = infer(variables, xs[0])
    det.block_until_ready()
    probe = time.perf_counter() - t0
    iters = max(4, min(iters, int(90.0 / max(probe, 1e-3))))

    t0 = time.perf_counter()
    for i in range(iters):
        det, valid = infer(variables, xs[(i + 1) % len(xs)])
    det.block_until_ready()
    dt = time.perf_counter() - t0

    img_s = batch_size * iters / dt
    print(json.dumps({
        "metric": "640x640 images/sec/chip incl. NMS (bs=%d, bf16, fused postprocess)" % batch_size,
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / A100_TARGET_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
