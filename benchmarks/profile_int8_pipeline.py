"""A/B: full inference pipeline (model + fused postprocess) bf16 vs int8 PTQ.

Same integrity methodology as bench.py: distinct on-device inputs,
dependency-chained iterations, forced scalar fetch, several short segments
with the best one reported per arm (the chip flaps; the RATIO between arms
measured in interleaved segments is the robust signal).

Run on a healthy chip (healthcheck > 100 TFLOP/s) for absolute numbers; the
bf16:int8 ratio is meaningful in any window since both arms share it.
"""

import json
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5, fold_batchnorm, quantize_int8
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect


def build(batch_size=64):
    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = base.init(rng, jnp.zeros((1, 640, 640, 3), jnp.float32))
    fused_vars = fold_batchnorm(variables)
    fused_model = base.clone(fused=True)
    anchors = jnp.asarray(normalized_anchors())

    gen = jax.jit(lambda k: jax.random.uniform(
        k, (batch_size, 640, 640, 3), jnp.float32))
    xs = [gen(jax.random.PRNGKey(i)) for i in range(6)]
    jax.block_until_ready(xs)

    qmodel, qvars = quantize_int8(fused_model, fused_vars, xs[:2])

    def make_infer(model, variables):
        @jax.jit
        def infer(x, acc):
            preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                                train=False)
            det, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                      iou_threshold=cfg.nms_iou_thresh,
                                      max_detections=cfg.max_detections,
                                      pre_nms_topk=cfg.pre_nms_topk)
            return det, valid, acc + valid.sum().astype(jnp.float32)
        return infer

    return (make_infer(fused_model, fused_vars), make_infer(qmodel, qvars),
            xs, cfg)


def time_segment(infer, xs, acc, k0, iters=8, batch_size=64):
    """acc/k0 thread across segments so no two calls are byte-identical
    (a result-caching relay could replay a repeated segment unexecuted)."""
    t0 = time.perf_counter()
    k = k0
    for _ in range(iters):
        det, valid, acc = infer(xs[k % len(xs)], acc)
        k += 1
    assert float(acc) >= 0.0  # forced scalar fetch
    return batch_size * iters / (time.perf_counter() - t0), acc, k


def main(batch_size=64, rounds=6):
    infer_bf16, infer_int8, xs, cfg = build(batch_size)
    # warm/compile both; keep per-arm accumulators threaded across all rounds
    state = {}
    for name, infer in (("bf16", infer_bf16), ("int8", infer_int8)):
        d, v, a = infer(xs[0], jnp.float32(0.0))
        jax.block_until_ready((d, v, a))
        state[name] = (a, 1)

    bf16, int8 = [], []
    for _ in range(rounds):      # interleave arms so flaps hit both equally
        r, a, k = time_segment(infer_bf16, xs, *state["bf16"],
                               batch_size=batch_size)
        bf16.append(r); state["bf16"] = (a, k)
        r, a, k = time_segment(infer_int8, xs, *state["int8"],
                               batch_size=batch_size)
        int8.append(r); state["int8"] = (a, k)
    out = {
        "bs": batch_size,
        "bf16_img_s_best": round(max(bf16), 1),
        "int8_img_s_best": round(max(int8), 1),
        "int8_speedup_best": round(max(int8) / max(bf16), 3),
        "bf16_segments": [round(s, 1) for s in bf16],
        "int8_segments": [round(s, 1) for s in int8],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
