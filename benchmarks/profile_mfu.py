"""MFU / roofline accounting for the serving pipeline (ROUND3_NOTES.md §MFU).

Uses XLA's own compiled cost model (lowered.compile().cost_analysis()) for
FLOP and HBM-byte counts — no hand-counted FLOPs — and the relay-safe
interleaved-arm timing shape (CLAUDE.md lane rule) for the measured side.
Prints per-batch FLOPs, bytes, arithmetic intensity, measured TFLOP/s, MFU
vs the v5e bf16 peak, and the combined roofline time.

Run on the real chip:
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_mfu.py [--bs 128]
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

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBS = 819.0


def cost(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def timed_arms(arms, xs, iters=8, reps=3):
    """Median seconds/call per arm; arms interleaved per rep (lane rule),
    iterations dependency-chained through a scalar accumulator."""
    out = {name: [] for name in arms}
    accs = {name: jnp.float32(0.0) for name in arms}
    for name, arm in arms.items():          # compile + warm
        accs[name] = arm(xs[0], accs[name])
        float(accs[name])
    for _ in range(reps):
        for name, arm in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                acc = arm(xs[i % len(xs)], acc)
            assert float(acc) >= 0.0
            out[name].append((time.perf_counter() - t0) / iters)
            accs[name] = acc
    return {name: sorted(v)[len(v) // 2] for name, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    opt = ap.parse_args()
    bs = opt.bs

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    def fwd(x, acc):
        preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                            train=False)
        return acc + sum(p.astype(jnp.float32).sum() * 0 for p in preds) + 1.0

    def full(x, acc):
        preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                            train=False)
        det, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                  iou_threshold=cfg.nms_iou_thresh,
                                  max_detections=cfg.max_detections,
                                  pre_nms_topk=cfg.topk_for_conf(0.25))
        return acc + valid.sum().astype(jnp.float32)

    x0 = jnp.zeros((bs, 640, 640, 3), jnp.float32)
    fwd_flops, fwd_bytes = cost(fwd, x0, jnp.float32(0.0))
    full_flops, full_bytes = cost(full, x0, jnp.float32(0.0))
    print(f"XLA cost model @ bs={bs}:")
    print(f"  forward: {fwd_flops / 1e12:.3f} TFLOP/batch "
          f"({fwd_flops / bs / 1e9:.1f} GFLOP/img), "
          f"{fwd_bytes / 1e9:.2f} GB accessed, "
          f"intensity {fwd_flops / max(fwd_bytes, 1):.0f} FLOP/B")
    print(f"  +postprocess: {full_flops / 1e12:.3f} TFLOP/batch, "
          f"{full_bytes / 1e9:.2f} GB accessed "
          f"(+{(full_bytes - fwd_bytes) / 1e9:.2f} GB over forward)")
    roof_s = max(fwd_flops / (V5E_PEAK_TFLOPS_BF16 * 1e12),
                 fwd_bytes / (V5E_PEAK_HBM_GBS * 1e9))
    print(f"  combined roofline (forward): {roof_s * 1e3:.1f} ms/batch")

    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    times = timed_arms({"fwd": jax.jit(fwd), "full": jax.jit(full)}, xs)
    dt = times["fwd"]
    tflops = fwd_flops / dt / 1e12
    print(f"fwd: {dt * 1e3:.1f} ms/batch = {bs / dt:.1f} img/s, "
          f"{tflops:.1f} TFLOP/s = "
          f"{tflops / V5E_PEAK_TFLOPS_BF16 * 100:.0f}% MFU, "
          f"HBM {fwd_bytes / dt / 1e9:.0f} GB/s, "
          f"roofline/measured = {roof_s / dt * 100:.0f}%")
    dt = times["full"]
    tflops = full_flops / dt / 1e12
    print(f"full: {dt * 1e3:.1f} ms/batch = {bs / dt:.1f} img/s, "
          f"{tflops:.1f} TFLOP/s "
          f"(postprocess +{(dt - times['fwd']) * 1e3:.2f} ms over fwd)")


if __name__ == "__main__":
    main()
