"""Eval-epoch wall time: overlapped vs serialized Evaluator.run.

VERDICT r2 #9: the host-side greedy matcher costs ~6.8ms/image; the
depth-1 software pipeline in Evaluator.run (dispatch batch i+1 before
syncing batch i) should hide device eval behind it. MEASURED (3
alternating reps, 2026-08-17, both arms the real Evaluator.run): overlap
saves 11-22% wall time (15.0 vs 17.5 ms/img median rep). An earlier
comparison against a hand-rolled lighter serial loop misread as overlap
losing — per-image work must be identical in both arms.

Batches are device-resident (generated on device — Evaluator.run's
jnp.asarray is then a no-op) with distinct contents, so the relay never
serves a cached result. NOTE: both arms call the SAME eval_batch program
repeatedly — on this relay that is the throttled single-program shape, so
ABSOLUTE numbers here are lane-dependent; the overlap-vs-serial DELTA
from the same process is the signal.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import Config
from yolov5m_tpu.eval.evaluator import Evaluator
from yolov5m_tpu.eval.metrics import MeanAveragePrecision
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.boxes import xywhn_to_xyxy_np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_batches(n_batches, bs, hw, rng):
    gen = jax.jit(lambda k: jax.random.uniform(k, (bs, hw, hw, 3),
                                               jnp.float32))
    batches = []
    for i in range(n_batches):
        labels = np.zeros((bs, 8, 5), np.float32)
        mask = np.zeros((bs, 8), bool)
        for b in range(bs):
            n = int(rng.integers(1, 5))
            labels[b, :n, 0] = rng.integers(0, 80, n)
            labels[b, :n, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
            labels[b, :n, 3:5] = rng.uniform(0.05, 0.3, (n, 2))
            mask[b, :n] = True
        batches.append({
            "image": jax.block_until_ready(gen(jax.random.PRNGKey(i))),
            "labels": labels, "mask": mask,
        })
    return batches


def main(n_batches: int = 12, bs: int = 8, hw: int = 640):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config(batch_size=bs, image_size=hw)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, hw, hw, 3), jnp.float32))
    ev_overlap = Evaluator(model, normalized_anchors(), cfg, overlap=True)
    ev_serial = Evaluator(model, normalized_anchors(), cfg, overlap=False)
    ev_auto = Evaluator(model, normalized_anchors(), cfg)
    rng = np.random.default_rng(0)
    batches = _make_batches(n_batches, bs, hw, rng)

    # warm compile (all evaluators share the eval_batch program shape)
    ev_overlap.run(variables, batches[:1])
    ev_serial.run(variables, batches[:1])

    def timed(ev):
        t0 = time.perf_counter()
        ev.run(variables, batches)
        return time.perf_counter() - t0

    n_img = n_batches * bs
    print(f"images: {n_img} (bs={bs}, {n_batches} batches, {hw}x{hw}); "
          f"auto default: overlap={ev_auto.overlap}")
    for rep in range(3):                       # alternate order each rep
        if rep % 2 == 0:
            to, ts = timed(ev_overlap), timed(ev_serial)
        else:
            ts, to = timed(ev_serial), timed(ev_overlap)
        print(f"rep {rep}: overlapped {1e3*to/n_img:.1f} ms/img, "
              f"serial {1e3*ts/n_img:.1f} ms/img "
              f"(overlap saves {100*(1-to/ts):.0f}%)")


if __name__ == "__main__":
    main()
