"""Gate A/B: full-sort top-k vs cumsum+searchsorted compaction (serving).

lax.top_k over the 25200 gated objectness logits is a full bitonic sort
(~log^2 N passes); the compact gate replaces it with an O(N) prefix sum +
K binary searches + a K-row sort (ops/postprocess.py _gate_compact). Exact
below capacity — tests/test_postprocess.py. This measures the e2e pipeline
delta at the serving shape (bs=128, conf 0.25, K=512), interleaved arms per
the relay lane rule.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_gate.py
"""

import argparse
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=7)
    opt = ap.parse_args()
    bs = opt.bs

    cfg = Config()
    variables = fold_batchnorm(
        YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    def make_arm(gate):
        @jax.jit
        def arm(x, acc):
            preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                                train=False)
            det, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                      iou_threshold=cfg.nms_iou_thresh,
                                      max_detections=cfg.max_detections,
                                      pre_nms_topk=cfg.topk_for_conf(0.25),
                                      gate=gate)
            return acc + valid.sum().astype(jnp.float32)
        return arm

    arms = {g: make_arm(g) for g in ("sort", "compact")}
    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    accs = {n: jnp.float32(0.0) for n in arms}
    for n, arm in arms.items():
        accs[n] = arm(xs[0], accs[n])
        float(accs[n])

    results = {n: [] for n in arms}
    for _ in range(opt.reps):
        for n, arm in arms.items():
            acc = accs[n]
            t0 = time.perf_counter()
            for i in range(opt.iters):
                acc = arm(xs[i % len(xs)], acc)
            assert float(acc) >= 0.0
            results[n].append((time.perf_counter() - t0) / opt.iters)
            accs[n] = acc

    base = sorted(results["sort"])[len(results["sort"]) // 2]
    for n, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:>8s}: {med * 1e3:7.2f} ms/batch  {bs / med:7.1f} img/s  "
              f"{base / med:.3f}x vs sort")


if __name__ == "__main__":
    main()
