"""XLA TPU compiler-option sweep on the bs=128 serving forward.

Forward is 53% MFU (benchmarks/profile_mfu.py); XLA exposes per-compile
knobs (compiler_options at AOT compile time) that can shift conv fusion and
VMEM scheduling without code changes. This sweeps a shortlist against the
default, with every arm timed in the interleaved relay-lane-safe shape
(CLAUDE.md lane rule; deltas between arms are the signal).

Unsupported option names raise at compile time — those arms are skipped and
reported, so the script is safe across libtpu versions.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_xla_flags.py
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

CANDIDATES = {
    "default": {},
    # bigger scoped-VMEM budget: lets the fusion pass keep larger conv
    # working sets on-chip (default is typically 16 MiB-ish)
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_24m": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    # flip the latency-hiding scheduler (single-chip: mostly reorders
    # compute/copy overlap)
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "lhs_on": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--full", action="store_true",
                    help="sweep the full pipeline instead of forward-only")
    ap.add_argument("--arms", type=str, default=None,
                    help="comma-separated subset of CANDIDATES (always "
                         "includes 'default'); compiles are minutes each "
                         "over the relay, so sweep in bounded chunks")
    opt = ap.parse_args()
    bs = opt.bs
    if opt.arms:
        keep = {"default"} | set(opt.arms.split(","))
        unknown = keep - set(CANDIDATES)
        assert not unknown, f"unknown arms: {sorted(unknown)}"
        for k in [k for k in CANDIDATES if k not in keep]:
            del CANDIDATES[k]

    cfg = Config()
    variables = fold_batchnorm(
        YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    def step(x, acc):
        preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                            train=False)
        if opt.full:
            det, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                      iou_threshold=cfg.nms_iou_thresh,
                                      max_detections=cfg.max_detections,
                                      pre_nms_topk=cfg.topk_for_conf(0.25))
            return acc + valid.sum().astype(jnp.float32)
        return acc + sum(p.astype(jnp.float32).sum() * 0 for p in preds) + 1.0

    x0 = jnp.zeros((bs, 640, 640, 3), jnp.float32)
    lowered = jax.jit(step).lower(x0, jnp.float32(0.0))

    arms = {}
    for name, options in CANDIDATES.items():
        try:
            arms[name] = lowered.compile(
                compiler_options=options if options else None)
            print(f"compiled {name} {options}")
        except Exception as e:  # unknown option on this libtpu
            print(f"SKIP {name}: {type(e).__name__}: {str(e)[:120]}")

    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, 640, 640, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    accs = {n: jnp.float32(0.0) for n in arms}
    for n, arm in arms.items():   # warm (executable already built)
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

    base = sorted(results["default"])[len(results["default"]) // 2]
    print(f"\n{'arm':>10s}  {'ms/batch':>9s}  {'img/s':>7s}  vs default")
    for n, ts in results.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{n:>10s}  {med * 1e3:9.2f}  {bs / med:7.1f}  {base / med:.3f}x")


if __name__ == "__main__":
    main()
