"""Serving latency: bs=1 end-to-end (uint8 frame → source-frame detections).

Throughput (bench.py, bs=64) is the headline; this measures the other axis a
serving deployment cares about — single-frame latency through the full
make_serving_fn graph (on-device letterbox + model + fused postprocess +
unletterbox). Relay-proof: distinct chained inputs, per-call scalar fetch
(each call IS a latency sample, so per-call sync is the measurement, not an
artifact). Reports p50/p90/best over interleaved rounds for bs=1/4/8.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5, fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.preprocess import make_serving_fn


def main(src_hw=(720, 1280), n_calls=30):
    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = base.clone(fused=True)
    anchors = jnp.asarray(normalized_anchors())

    out = {"src_hw": list(src_hw)}
    for bs in (1, 4, 8):
        serve = make_serving_fn(model, variables, anchors, src_hw=src_hw,
                                image_size=cfg.image_size)
        gen = jax.jit(lambda k, b=bs: jax.random.randint(
            k, (b, *src_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))
        frames = [gen(jax.random.PRNGKey(i)) for i in range(8)]
        jax.block_until_ready(frames)
        det, valid = serve(frames[0])
        jax.block_until_ready((det, valid))          # compile

        lat = []
        for i in range(n_calls):
            t0 = time.perf_counter()
            det, valid = serve(frames[i % len(frames)])
            _ = float(valid.sum())                   # forced completion
            lat.append((time.perf_counter() - t0) * 1000)
        lat = np.asarray(lat)
        out[f"bs{bs}"] = {
            "best_ms": round(float(lat.min()), 2),
            "p50_ms": round(float(np.percentile(lat, 50)), 2),
            "p90_ms": round(float(np.percentile(lat, 90)), 2),
            "best_img_s": round(bs / lat.min() * 1000, 1),
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
