"""Train-step throughput A/B: flat-vector optimizer vs per-leaf, bs sweep.

Interleaved-arm shape (several distinct jitted programs per round) — the
only measurement shape the relay serves at chip speed (CLAUDE.md relay lane
rule). Each arm is a full donated train step; state threads through calls,
so every call is unique (no relay result caching) and the final fetch
proves execution.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_train_flat.py
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import (
    accumulation_steps, create_train_state, make_optimizer, make_train_step)

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(rounds: int = 8, iters: int = 4):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig.from_config(cfg),
                       np.asarray(ANCHORS, np.float32), kind="custom")

    arms = {}       # name -> (step_fn, state, batches)
    rng = np.random.default_rng(0)
    # NOTE: all arms hold their TrainState + activations live at once
    # (interleaving is required by the relay lane rule); a 4th bs=64 arm
    # OOMs the 16GB HBM next to these three.
    arm_specs = ((16, True), (32, True), (32, False))
    for bs, flat in arm_specs:
        name = f"bs{bs}_{'flat' if flat else 'tree'}"
        accumulate = accumulation_steps(bs, cfg.nominal_batch_size)
        opt = make_optimizer(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (640, 640), opt, flat=flat)
        step = jax.jit(make_train_step(model, loss_fn, opt, accumulate,
                                       flat=flat), donate_argnums=0)
        labels = np.zeros((bs, 8, 5), np.float32)
        labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
        labels[:, 1] = [2, 0.3, 0.7, 0.1, 0.15]
        mask = np.zeros((bs, 8), bool)
        mask[:, :2] = True
        gen = jax.jit(lambda k, b=bs: jax.random.uniform(
            k, (b, 640, 640, 3), jnp.float32))
        xs = [gen(jax.random.PRNGKey(i)) for i in range(4)]
        jax.block_until_ready(xs)
        arms[name] = [step, state, xs, jnp.asarray(labels), jnp.asarray(mask),
                      accumulate]

    # compile
    for name, arm in arms.items():
        t0 = time.time()
        arm[1], m = arm[0](arm[1], arm[2][0], arm[3], arm[4])
        float(m["loss"])
        print(f"{name}: compiled+first in {time.time()-t0:.1f}s "
              f"(accumulate={arm[5]})")

    results = {name: [] for name in arms}
    k = 0
    for r in range(rounds):
        for name, arm in arms.items():
            step, state, xs = arm[0], arm[1], arm[2]
            bs = xs[0].shape[0]
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = step(state, xs[(k + i) % len(xs)], arm[3], arm[4])
            assert np.isfinite(float(m["loss"]))
            dt = time.perf_counter() - t0
            arm[1] = state
            k += iters
            results[name].append(bs * iters / dt)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.0f}" for n in results))

    print("\n== median img/s ==")
    for name, vals in results.items():
        med = statistics.median(vals)
        best = max(vals)
        bs = int(name[2:].split("_")[0])
        print(f"{name}: median {med:.1f} img/s ({bs*1000/med:.1f} ms/step), "
              f"best {best:.1f}")


if __name__ == "__main__":
    main()
