"""End-to-end learning smoke: train on synthetic colored-rectangle data and
verify mAP50 climbs well above chance. Proves the full loop — data, target
assignment, loss, optimizer, eval — actually learns, without needing COCO.

Usage: PYTHONPATH=. python benchmarks/learning_smoke.py [--steps 400]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.eval import Evaluator
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    create_train_state, make_optimizer, make_train_step)

HW = 256
NC = 3
COLORS = np.array([[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.float32)


def make_batch(rng, bs, nb=8):
    """Images with 1-3 solid class-colored rectangles on noise background."""
    img = rng.uniform(0, 0.25, (bs, HW, HW, 3)).astype(np.float32)
    labels = np.zeros((bs, nb, 5), np.float32)
    mask = np.zeros((bs, nb), bool)
    for b in range(bs):
        for k in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, NC))
            w = rng.uniform(0.15, 0.45)
            h = rng.uniform(0.15, 0.45)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            x1, y1 = int((cx - w / 2) * HW), int((cy - h / 2) * HW)
            x2, y2 = int((cx + w / 2) * HW), int((cy + h / 2) * HW)
            img[b, y1:y2, x1:x2] = COLORS[cls] / 255.0
            labels[b, k] = [cls, cx, cy, w, h]
            mask[b, k] = True
    return img, labels, mask


class SyntheticLoader:
    """Minimal loader protocol (dicts with image/labels/mask) for Evaluator."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def main(steps=400, bs=8, lr=1e-3):
    cfg = Config(first_out=16, nc=NC, image_size=HW, batch_size=bs,
                 learning_rate=lr, compute_dtype="bfloat16",
                 conf_threshold=0.1)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), (HW, HW),
                               optimizer)
    step = jax.jit(make_train_step(model, loss_fn, optimizer, accumulate=1))

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(steps):
        img, labels, mask = make_batch(rng, bs)
        state, metrics = step(state, jnp.asarray(img), jnp.asarray(labels),
                              jnp.asarray(mask))
        if i % 50 == 0:
            print(f"step {i:4d} loss {float(metrics['loss']):8.4f} "
                  f"box {float(metrics['box']):.4f} obj {float(metrics['obj']):.4f} "
                  f"cls {float(metrics['cls']):.4f}", flush=True)
    print(f"trained {steps} steps in {time.time() - t0:.0f}s")

    val_rng = np.random.default_rng(123)
    val_batches = []
    for _ in range(4):
        img, labels, mask = make_batch(val_rng, bs)
        val_batches.append({"image": img, "labels": labels, "mask": mask})

    evaluator = Evaluator(model, normalized_anchors(), cfg,
                          np.asarray(ANCHORS, np.float32))
    results = evaluator.run(
        {"params": state.params, "batch_stats": state.batch_stats},
        SyntheticLoader(val_batches))
    print(f"map50={results['map50']:.3f} map75={results['map75']:.3f} "
          f"class_acc={results['class_accuracy']:.3f} "
          f"obj_acc={results['obj_accuracy']:.3f}")
    assert results["map50"] > 0.5, "model failed to learn synthetic shapes"
    print("LEARNING SMOKE PASSED")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    args = p.parse_args()
    main(steps=args.steps)
