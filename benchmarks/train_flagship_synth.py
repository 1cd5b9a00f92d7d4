"""Train the FLAGSHIP model (first_out=48, nc=80) on on-device synthetic
structured images and commit the weights for bench.py's trained-load arm.

Why this exists (VERDICT r3 Missing #2 / Next #2): the headline benchmark
previously ran random-init weights on uniform noise, so nothing in the
record said how many candidates actually flow through the gate/top-k/NMS
per image. These weights give the bench a REALISTIC detection load: an
objectness head calibrated on structured inputs (class-colored rectangles,
yolov5m_tpu/data/synthetic.py), emitting non-degenerate gate-survivor and
detection densities.

Protocol notes:
  * data is generated INSIDE the train jit (fresh every step, zero host
    traffic — uploads of 640² batches over this tunnel take minutes);
  * multi-scale buckets {512, 576, 640} = three DISTINCT jitted programs
    interleaved, which is also what keeps the process in the relay's fast
    lane (CLAUDE.md lane rule: single-program loops are throttled);
  * saves EMA params + live BN stats, bf16, via flax msgpack to
    weights/flagship_synth_bf16.msgpack + a provenance sidecar JSON.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/train_flagship_synth.py [--steps 1500]
"""

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.data.synthetic import synth_batch
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import gate_density
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    accumulation_steps, create_train_state, make_optimizer, make_train_step)
from yolov5m_tpu.utils.checkpoint import strip_checkpoint

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WEIGHTS_PATH = os.path.join(_HERE, "weights", "flagship_synth_bf16.msgpack")
SIZES = (512, 576, 640)


def main(steps: int = 1500, bs: int = 64, lr: float = 1e-3, seed: int = 0):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache(os.path.join(_HERE, ".jax_cache"))

    cfg = Config(batch_size=bs, learning_rate=lr)
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig.from_config(cfg),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed),
                               (640, 640), optimizer)
    accumulate = accumulation_steps(bs, cfg.nominal_batch_size)
    step = make_train_step(model, loss_fn, optimizer, accumulate)

    def make_bucket(hw):
        def f(st, key):
            img, labels, mask = synth_batch(key, bs, hw, cfg.nc)
            return step(st, img, labels, mask)
        return jax.jit(f, donate_argnums=0)

    buckets = [make_bucket(hw) for hw in SIZES]
    rng = np.random.default_rng(seed)
    t0 = time.time()
    losses = []
    for i in range(steps):
        b = int(rng.integers(0, len(SIZES)))
        state, metrics = buckets[b](state, jax.random.PRNGKey(seed * steps + i))
        if i % 100 == 0 or i == steps - 1:
            l = float(metrics["loss"])        # one host sync per 100 steps
            losses.append(l)
            print(f"step {i:5d} size {SIZES[b]} loss {l:8.4f} "
                  f"({(i + 1) * bs / (time.time() - t0):.0f} img/s)",
                  flush=True)
            assert np.isfinite(l), "training diverged"
    train_secs = time.time() - t0

    # ---- persist EMA params + BN stats (bf16) -------------------------------
    stripped = strip_checkpoint(state, keep_ema=True)
    os.makedirs(os.path.dirname(WEIGHTS_PATH), exist_ok=True)
    from flax import serialization
    blob = serialization.msgpack_serialize(
        jax.tree.map(np.asarray, stripped))
    tmp = WEIGHTS_PATH + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, WEIGHTS_PATH)
    print(f"wrote {WEIGHTS_PATH} ({len(blob) / 1e6:.1f} MB)")

    # ---- detection-density report (the stats the bench record needs) -------
    fused_vars = fold_batchnorm(
        {"params": jax.tree.map(lambda x: np.asarray(x, np.float32),
                                stripped["params"]),
         "batch_stats": jax.tree.map(lambda x: np.asarray(x, np.float32),
                                     stripped["batch_stats"])})
    fmodel = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                    fused=True)
    anchors = jnp.asarray(normalized_anchors())

    @jax.jit
    def density(x):
        # shared statistic definition: ops/postprocess.py gate_density
        # (same fn bench.py's detection_density record uses)
        preds = fmodel.apply(fused_vars, x, train=False)
        return gate_density(
            preds, anchors, conf_threshold=0.25,
            iou_threshold=cfg.nms_iou_thresh,
            max_detections=cfg.max_detections,
            pre_nms_topk=cfg.topk_for_conf(0.25))

    @jax.jit
    def structured(key):
        img, _, _ = synth_batch(key, 16, 640, cfg.nc)
        return img

    @jax.jit
    def noise(key):
        return jax.random.uniform(key, (16, 640, 640, 3))

    stats = {}
    for name, gen in (("structured", structured), ("noise", noise)):
        sv, dv = [], []
        for i in range(4):
            s, d = density(gen(jax.random.PRNGKey(1000 + i)))
            sv.append(np.asarray(s)); dv.append(np.asarray(d))
        stats[name] = {
            "gate_survivors_per_image": round(float(np.mean(sv)), 1),
            "detections_per_image": round(float(np.mean(dv)), 1)}
        print(f"{name}: {stats[name]}")

    sidecar = {
        "trained": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "steps": steps, "batch_size": bs, "lr": lr,
        "sizes": list(SIZES), "seed": seed,
        "train_seconds": round(train_secs, 1),
        "final_loss": losses[-1],
        "data": "yolov5m_tpu/data/synthetic.py synth_batch (on-device)",
        "params": "EMA, bf16; batch_stats live, bf16",
        "density_at_conf_0.25": stats,
    }
    with open(WEIGHTS_PATH.replace(".msgpack", ".json"), "w") as f:
        json.dump(sidecar, f, indent=1)
    print(json.dumps(sidecar))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    args = p.parse_args()
    main(steps=args.steps, bs=args.bs, lr=args.lr)
