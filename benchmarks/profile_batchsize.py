"""Full-pipeline batch-size sweep: is there headroom past bs=64?

VERDICT r2 #1b asked for a bs=128 arm. Arms are the SAME fused pipeline
(forward + fused_detect, default NMS backend) at different batch sizes,
each scanning enough chained batches that every arm processes the same
256 images per call (so per-call dispatch overhead is identical and the
img/s numbers are directly comparable). Interleaved rounds (relay lane
rule, CLAUDE.md).
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGES_PER_CALL = 256


def main(rounds: int = 12, sizes=(32, 64, 96, 128)):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3), jnp.float32)))
    model = base.clone(fused=True)
    anchors = jnp.asarray(normalized_anchors())

    def make_arm(bs):
        chain_len = max(IMAGES_PER_CALL // bs, 1)

        @jax.jit
        def arm(xs, acc):
            def body(acc, x):
                preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                                    train=False)
                det, valid = fused_detect(
                    preds, anchors, conf_threshold=0.25,
                    iou_threshold=cfg.nms_iou_thresh,
                    max_detections=cfg.max_detections,
                    pre_nms_topk=cfg.pre_nms_topk)
                return acc + valid.sum().astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, acc, xs)
            return acc
        gen = jax.jit(lambda k, c=chain_len, b=bs: jax.random.uniform(
            k, (c, b, 640, 640, 3), jnp.float32))
        xs = [jax.block_until_ready(gen(jax.random.PRNGKey(7 * bs + i)))
              for i in range(2)]
        return arm, xs, chain_len * bs

    arms = {}
    for bs in sizes:
        arm, xs, n_img = make_arm(bs)
        t0 = time.time()
        acc = arm(xs[0], jnp.float32(0.0))
        float(acc)
        print(f"bs{bs}: compiled+first {time.time()-t0:.1f}s")
        arms[bs] = [arm, xs, n_img, acc]

    results = {bs: [] for bs in sizes}
    j = 0
    for _ in range(rounds):
        for bs, st in arms.items():
            arm, xs, n_img, acc = st
            t0 = time.perf_counter()
            acc = arm(xs[j % 2], acc)
            assert float(acc) >= 0
            dt = time.perf_counter() - t0
            st[3] = acc
            results[bs].append(n_img / dt)
            j += 1

    print(f"\n== img/s ({IMAGES_PER_CALL} img/call) ==")
    for bs, vals in results.items():
        print(f"bs{bs}: median {statistics.median(vals):.1f} "
              f"(max {max(vals):.1f})")


if __name__ == "__main__":
    main()
