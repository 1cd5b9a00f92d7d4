"""Serving LATENCY: the axis the throughput headline doesn't cover.

bench.py measures peak img/s at bs=128 with 2-batch scan chains (the
throughput serving shape). A latency-sensitive deployment runs small
batches and cares about tail percentiles. This publishes that story
(round-4 review Missing #2 / Next #4):

  part 1 — single-dispatch pipeline latency: make_serving_fn (uint8 frame
  → source-frame detections incl. NMS, one XLA graph) at bs = 1/8/32/128:
  best / p50 / p99 per CALL, measured over interleaved distinct inputs
  (relay result-cache rule) with a per-call sync — each call IS a latency
  sample. The committed flagship weights provide a realistic detection
  load when present (noise-input column kept for continuity).

  part 2 — the batcher tradeoff through serving/server.py: a solo client's
  request pays up to max_wait_ms of batch-gathering delay; concurrent
  clients amortize one device dispatch. Measured through the REAL socket
  server: solo-request p50/p99 at max_wait_ms = 0/5/20, then an 8-burst
  completion time at each setting.

NOTE on absolutes: per-call dispatch over this tunneled relay costs
~4.1 ms minimum (benchmarks/profile_dispatch.py) and the relay can sit in
a ~25 ms dispatch-floor window for hours (CLAUDE.md). Production TPU
hosts are co-located (PCIe, <0.1 ms dispatch) — treat the bs-scaling
SHAPE and the batcher DELTAS as the result, and the absolute floor as an
upper bound that includes transport.

Reference analog: the reference's only inference mode is single-image
eager torch (reference detect.py:50-51); it publishes no latency numbers.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5, fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.preprocess import make_serving_fn


def load_variables(cfg):
    """Flagship trained weights when present (BN-folded), else random."""
    from yolov5m_tpu.models.weights import load_flagship
    variables, _ = load_flagship(fold=True, missing_ok=True)
    if variables is not None:
        return variables, "trained(flagship_synth)"
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    return fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))), \
        "random-init"


def pipeline_latency(src_hw=(720, 1280), n_calls=60, batch_sizes=(1, 8, 32, 128)):
    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    variables, load = load_variables(cfg)
    anchors = jnp.asarray(normalized_anchors())

    out = {"src_hw": list(src_hw), "load": load, "n_calls": n_calls}
    serves, frames = {}, {}
    for bs in batch_sizes:
        serves[bs] = make_serving_fn(model, variables, anchors,
                                     src_hw=src_hw,
                                     image_size=cfg.image_size)
        gen = jax.jit(lambda k, b=bs: jax.random.randint(
            k, (b, *src_hw, 3), 0, 256, jnp.int32).astype(jnp.uint8))
        frames[bs] = [gen(jax.random.PRNGKey(7 * bs + i)) for i in range(8)]
        jax.block_until_ready(frames[bs])
        jax.block_until_ready(serves[bs](frames[bs][0]))   # compile

    # interleave batch sizes round-robin: the relay throttles single-program
    # loops (CLAUDE.md lane rule), and interleaving also randomizes any
    # slow-window bias fairly across arms
    lat = {bs: [] for bs in batch_sizes}
    for i in range(n_calls):
        for bs in batch_sizes:
            t0 = time.perf_counter()
            det, valid = serves[bs](frames[bs][i % 8])
            _ = int(jax.device_get(valid.sum()))           # forced completion
            lat[bs].append((time.perf_counter() - t0) * 1e3)

    for bs in batch_sizes:
        a = np.asarray(lat[bs])
        out[f"bs{bs}"] = {
            "best_ms": round(float(a.min()), 2),
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "p50_img_s": round(bs / np.percentile(a, 50) * 1e3, 1),
        }
    return out


def batcher_tradeoff(n_solo=30, burst=8, waits_ms=(0.0, 5.0, 20.0)):
    """max_wait_ms tradeoff through the real DetectionServer socket path."""
    import io

    from PIL import Image

    from yolov5m_tpu.serving import DetectionClient, DetectionServer

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    variables, load = load_variables(cfg)

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8)).save(
        buf, format="JPEG")
    blob = buf.getvalue()

    results = {"load": load, "n_solo": n_solo, "burst": burst}
    for wait in waits_ms:
        server = DetectionServer(model, variables, normalized_anchors(),
                                 image_size=cfg.image_size, batch_size=burst,
                                 max_wait_ms=wait)
        with server, DetectionClient(port=server.port) as client:
            client.detect(blob)                           # warm
            solo = []
            for _ in range(n_solo):
                t0 = time.perf_counter()
                client.detect(blob)
                solo.append((time.perf_counter() - t0) * 1e3)
            # burst: fire `burst` requests back-to-back on one connection,
            # then collect all responses — the server batches them into
            # few dispatches; completion/req measures the amortization
            t0 = time.perf_counter()
            for _ in range(burst):
                client.send(blob)
            for _ in range(burst):
                client.recv()
            burst_ms = (time.perf_counter() - t0) * 1e3
        a = np.asarray(solo)
        results[f"wait{wait:g}ms"] = {
            "solo_p50_ms": round(float(np.percentile(a, 50)), 2),
            "solo_p99_ms": round(float(np.percentile(a, 99)), 2),
            "burst8_total_ms": round(burst_ms, 2),
            "burst8_per_req_ms": round(burst_ms / burst, 2),
        }
    return results


def main():
    out = {"pipeline": pipeline_latency()}
    print(json.dumps({"partial": out}), flush=True)
    out["batcher"] = batcher_tradeoff()
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
