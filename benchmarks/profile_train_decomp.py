"""Decompose the training step: model fwd+bwd vs loss/targets vs optimizer."""
import time
import numpy as np
import jax, jax.numpy as jnp
import optax
from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train import LossConfig, YoloLoss

bs = 16
cfg = Config(batch_size=bs)
model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,640,640,3)))
params, stats = variables["params"], variables["batch_stats"]
loss_fn = YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32), kind="custom")
loss_ultra = YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32), kind="ultralytics")

gen = jax.jit(lambda k: (
    jax.random.uniform(k, (bs, 640, 640, 3), jnp.float32),
    jnp.tile(jnp.asarray([[1, .5, .5, .2, .3]], jnp.float32)[None], (bs, 120, 1)),
    jnp.ones((bs, 120), bool)))
batches = [gen(jax.random.PRNGKey(i)) for i in range(4)]
jax.block_until_ready(batches)

def bench(name, fn, n=8):
    r = fn(*batches[0]); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*batches[i % 4])
    jax.block_until_ready(r)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1000:7.1f} ms", flush=True)

@jax.jit
def fwd_bwd_dummy(img, labels, mask):
    def lf(p):
        preds, mut = model.apply({"params": p, "batch_stats": stats}, img,
                                 train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o) for o in preds)
    return jax.grad(lf)(params)

@jax.jit
def fwd_bwd_custom(img, labels, mask):
    def lf(p):
        preds, mut = model.apply({"params": p, "batch_stats": stats}, img,
                                 train=True, mutable=["batch_stats"])
        return loss_fn(preds, labels, mask)[0]
    return jax.grad(lf)(params)

@jax.jit
def fwd_bwd_ultra(img, labels, mask):
    def lf(p):
        preds, mut = model.apply({"params": p, "batch_stats": stats}, img,
                                 train=True, mutable=["batch_stats"])
        return loss_ultra(preds, labels, mask)[0]
    return jax.grad(lf)(params)

@jax.jit
def fwd_only(img, labels, mask):
    preds, mut = model.apply({"params": params, "batch_stats": stats}, img,
                             train=True, mutable=["batch_stats"])
    return sum(jnp.sum(o) for o in preds)

bench("fwd only (train mode)", fwd_only)
bench("fwd+bwd dummy loss", fwd_bwd_dummy)
bench("fwd+bwd custom loss", fwd_bwd_custom)
bench("fwd+bwd ultralytics loss", fwd_bwd_ultra)
