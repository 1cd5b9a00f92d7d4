"""Batched validation-loop throughput (BASELINE.json configs[1]).

Measures the full Evaluator path on synthetic data: jitted
forward+decode+NMS+accuracy per batch, host-side mAP accumulation —
img/s for the whole val loop, plus the device-only portion.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.eval import Evaluator
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.yolo import normalized_anchors

bs, n_batches = 32, 8
cfg = Config(batch_size=bs)
model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))
evaluator = Evaluator(model, normalized_anchors(), cfg,
                      np.asarray(ANCHORS, np.float32))

rng = np.random.default_rng(0)
batches = []
for i in range(n_batches):
    labels = np.zeros((bs, 32, 5), np.float32)
    mask = np.zeros((bs, 32), bool)
    for b in range(bs):
        n = rng.integers(1, 8)
        labels[b, :n, 0] = rng.integers(0, 80, n)
        labels[b, :n, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
        labels[b, :n, 3:5] = rng.uniform(0.05, 0.3, (n, 2))
        mask[b, :n] = True
    batches.append({"image": rng.uniform(0, 1, (bs, 640, 640, 3)).astype(np.float32),
                    "labels": labels, "mask": mask})

# device-only portion
jb = [(jnp.asarray(b["image"]), jnp.asarray(b["labels"]), jnp.asarray(b["mask"]))
      for b in batches]
r = evaluator._eval_batch(variables, *jb[0])
jax.block_until_ready(r)
t0 = time.perf_counter()
for img, lab, msk in jb:
    r = evaluator._eval_batch(variables, img, lab, msk)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / n_batches
print(f"device eval batch (fwd+decode+NMS+acc)  {dt*1000:7.1f} ms/batch "
      f"{bs/dt:7.1f} img/s", flush=True)

# full loop incl. host mAP accumulation
t0 = time.perf_counter()
results = evaluator.run(variables, batches)
dt = time.perf_counter() - t0
print(f"full val loop (incl. host mAP)          "
      f"{dt/n_batches*1000:7.1f} ms/batch {bs*n_batches/dt:7.1f} img/s")
print({k: round(v, 4) for k, v in results.items() if isinstance(v, float)})
