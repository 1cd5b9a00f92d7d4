"""Shared harness for the augmentation-generalization proof.

Train distribution: LARGE solid colored rectangles (w,h in [0.30, 0.45]).
Val distribution: SMALL ones (w,h in [0.12, 0.20]) — a deliberate scale
shift. Mosaic composes 4 images onto a 2s canvas and downscales, so a
mosaic-trained model has seen half-scale boxes; a plain-trained model never
has. mAP50 on the shifted val set therefore measures whether the mosaic/HSV
pipeline (north-star config "full augmentation training", BASELINE.json
configs[3]) actually *helps* generalization, not merely runs.
"""

import os

import numpy as np
from PIL import Image

HW = 128
NC = 3
COLORS = np.array([[220, 40, 40], [40, 220, 40], [40, 40, 220]], np.uint8)


def _write_split(root, split, n, rng, wh_range):
    os.makedirs(os.path.join(root, "images", split), exist_ok=True)
    os.makedirs(os.path.join(root, "labels", split), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0, 64, (HW, HW, 3))).astype(np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 3))):
            cls = int(rng.integers(0, NC))
            w = rng.uniform(*wh_range)
            h = rng.uniform(*wh_range)
            cx = rng.uniform(w / 2, 1 - w / 2)
            cy = rng.uniform(h / 2, 1 - h / 2)
            x1, y1 = int((cx - w / 2) * HW), int((cy - h / 2) * HW)
            x2, y2 = int((cx + w / 2) * HW), int((cy + h / 2) * HW)
            img[y1:y2, x1:x2] = COLORS[cls]
            rows.append(f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        Image.fromarray(img).save(
            os.path.join(root, "images", split, f"img{i:03d}.png"))
        with open(os.path.join(root, "labels", split, f"img{i:03d}.txt"),
                  "w") as f:
            f.write("\n".join(rows))


def write_dataset(root, n_train=24, n_val=8):
    rng = np.random.default_rng(7)
    _write_split(root, "train", n_train, rng, (0.30, 0.45))
    _write_split(root, "val", n_val, rng, (0.12, 0.20))
    return root


def train_and_eval(root, steps, mosaic_p=0.0, hsv=False, bs=8, lr=2e-3,
                   seed=0):
    """Train `steps` on the large-box train split through the REAL BatchLoader
    (mosaic/HSV path), then mAP50 on the small-box val split."""
    import jax
    import jax.numpy as jnp

    from yolov5m_tpu.config import ANCHORS, Config
    from yolov5m_tpu.data.dataset import BatchLoader, DetectionDataset
    from yolov5m_tpu.eval import Evaluator
    from yolov5m_tpu.models import YOLOv5
    from yolov5m_tpu.models.yolo import normalized_anchors
    from yolov5m_tpu.train import LossConfig, YoloLoss
    from yolov5m_tpu.train.trainer import (
        create_train_state, make_optimizer, make_train_step)

    cfg = Config(first_out=8, nc=NC, image_size=HW, batch_size=bs,
                 learning_rate=lr, compute_dtype="float32",
                 conf_threshold=0.1)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.float32)
    loss_fn = YoloLoss(LossConfig(nc=NC, image_size=HW),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed), (HW, HW),
                               optimizer)
    step = jax.jit(make_train_step(model, loss_fn, optimizer, accumulate=1))

    train_ds = DetectionDataset(root, train=True, default_size=HW, bs=bs,
                                bboxes_format="yolo", max_boxes=16)
    loader = BatchLoader(train_ds, bs, shuffle=True, seed=seed,
                         drop_last=True, mosaic_p=mosaic_p, hsv=hsv)
    done, epoch = 0, 0
    while done < steps:
        loader.set_epoch(epoch)
        epoch += 1
        for batch in loader:
            state, metrics = step(state, jnp.asarray(batch["image"]),
                                  jnp.asarray(batch["labels"]),
                                  jnp.asarray(batch["mask"]))
            done += 1
            if done >= steps:
                break

    val_ds = DetectionDataset(root, train=False, default_size=HW, bs=bs,
                              bboxes_format="yolo", max_boxes=16)
    val_loader = BatchLoader(val_ds, bs, shuffle=False, drop_last=False)
    evaluator = Evaluator(model, normalized_anchors(), cfg,
                          np.asarray(ANCHORS, np.float32))
    results = evaluator.run(
        {"params": state.params, "batch_stats": state.batch_stats},
        val_loader)
    return results, float(metrics["loss"])
