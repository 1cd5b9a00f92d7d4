"""Training-step throughput at full scale (640x640, first_out=48)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import create_train_state, make_optimizer, make_train_step

for bs in (16, 32):
    cfg = Config(batch_size=bs)
    model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32), kind="custom")
    optimizer = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), (640, 640), optimizer)
    step = jax.jit(make_train_step(model, loss_fn, optimizer, accumulate=1))  # no donation: axon relay rejects aliased buffers

    gen = jax.jit(lambda k: (
        jax.random.uniform(k, (bs, 640, 640, 3), jnp.float32),
        jnp.tile(jnp.asarray([[1, .5, .5, .2, .3], [0, .3, .3, .1, .1]], jnp.float32)[None], (bs, 1, 1)),
        jnp.ones((bs, 2), bool)))
    batches = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    jax.block_until_ready(batches)

    state, m = step(state, *batches[0])
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    n = 12
    for i in range(n):
        state, m = step(state, *batches[i % 4])
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n
    print(f"train step bs={bs}: {dt*1000:.1f} ms  {bs/dt:.1f} img/s  loss={float(m['loss']):.3f}", flush=True)
