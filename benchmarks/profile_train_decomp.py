"""Decompose the training step: fwd vs fwd+bwd vs loss flavor vs full step.

Relay-proof (see CLAUDE.md): distinct inputs, every timed call chained
through a device scalar folded into the image, final scalar fetch. Arms are
INTERLEAVED per round so a chip flap hits all arms equally; each arm reports
its best round.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    create_train_state, make_optimizer, make_train_step)

BS = 16


def main(bs=BS, rounds=4):
    cfg = Config(batch_size=bs)
    model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    loss_fns = {
        "custom": YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32),
                           kind="custom"),
        "ultra": YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32),
                          kind="ultralytics"),
    }

    gen = jax.jit(lambda k: (
        jax.random.uniform(k, (bs, 640, 640, 3), jnp.float32),
        jnp.tile(jnp.asarray([[1, .5, .5, .2, .3]], jnp.float32)[None],
                 (bs, 120, 1)),
        jnp.ones((bs, 120), bool)))
    batches = [gen(jax.random.PRNGKey(i)) for i in range(4)]
    jax.block_until_ready(batches)

    def fwd_only(img, labels, mask):
        preds, _ = model.apply({"params": params, "batch_stats": stats}, img,
                               train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32)) for o in preds)

    def grad_of(loss_kind):
        def f(img, labels, mask):
            def lf(p):
                preds, _ = model.apply({"params": p, "batch_stats": stats},
                                       img, train=True,
                                       mutable=["batch_stats"])
                if loss_kind == "dummy":
                    return sum(jnp.sum(o.astype(jnp.float32)) for o in preds)
                return loss_fns[loss_kind](preds, labels, mask)[0]
            g = jax.grad(lf)(params)
            return sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in jax.tree.leaves(g))
        return f

    # full jitted train step (state threaded through the chain itself)
    optimizer = make_optimizer(cfg)
    step = jax.jit(make_train_step(model, loss_fns["custom"], optimizer,
                                   accumulate=1))
    state0 = create_train_state(model, cfg, jax.random.PRNGKey(0), (640, 640),
                                optimizer)

    arms = {
        "fwd only (train mode)": fwd_only,
        "fwd+bwd dummy loss": grad_of("dummy"),
        "fwd+bwd custom loss": grad_of("custom"),
        "fwd+bwd ultralytics loss": grad_of("ultra"),
    }

    chained = {}
    accs = {}   # threaded across rounds: a reset would replay identical
    # (input, acc) sequences, which a result-caching relay could serve
    for name, fn in arms.items():
        @jax.jit
        def c(img, labels, mask, acc, fn=fn):
            return acc + fn(img + (acc * 0).astype(img.dtype), labels, mask)
        a = c(*batches[0], jnp.float32(0.0))
        float(a)
        chained[name] = c
        accs[name] = a

    # warm the full step (state threading makes every step call unique)
    state = state0
    state, m = step(state, *batches[0])
    float(m["loss"])

    segs = {name: [] for name in chained}
    segs["full train_step (custom, acc=1)"] = []
    for _ in range(rounds):
        for name, c in chained.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for b in batches:
                acc = c(*b, acc)
            float(acc)
            accs[name] = acc
            segs[name].append((time.perf_counter() - t0) / len(batches))
        # full step: state-threading is the dependency chain
        t0 = time.perf_counter()
        for b in batches:
            state, m = step(state, *b)
        float(m["loss"])
        segs["full train_step (custom, acc=1)"].append(
            (time.perf_counter() - t0) / len(batches))

    for name, ss in segs.items():
        dt = min(ss)
        all_ms = "/".join(f"{s*1000:.0f}" for s in ss)
        print(f"{name:36s} best {dt*1000:7.1f} ms  {bs/dt:6.1f} img/s"
              f"  (rounds: {all_ms})", flush=True)


if __name__ == "__main__":
    main()
