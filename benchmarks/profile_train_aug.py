"""On-device augmentation cost as a FULL TRAIN-STEP delta.

Small-program timings are unreliable over the relay (CLAUDE.md); the
honest cost of the device augmentation program is the delta between
train-step programs that differ only in the augmentation prologue, all
interleaved in one process (lane rule), donated states, distinct inputs.

  step       bs=64 @ 640², custom loss, Adam+EMA — the baseline
  aug_step   device_augment_batch(mosaic .5 + HSV + flips + cj .4)
             fused in front of the same step (the --device_mosaic
             --device_augment --hsv shipped set)
  rot_step   aug_step + rotate p=.7 (the op we keep host-side — this arm
             prices the alternative)

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_train_aug.py
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.ops.augment_device import device_augment_batch
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import create_train_state, make_optimizer

BS = 64
SIZE = 640
NB = 24
ITERS = 3
ROUNDS = 8


def main():
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig.from_config(cfg),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    opt = make_optimizer(cfg)

    rng = np.random.default_rng(0)
    labels = np.zeros((BS, NB, 5), np.float32)
    labels[:, :4, 0] = rng.integers(0, cfg.nc, (BS, 4))
    labels[:, :4, 1:3] = rng.uniform(0.3, 0.7, (BS, 4, 2))
    labels[:, :4, 3:] = rng.uniform(0.08, 0.25, (BS, 4, 2))
    mask = np.zeros((BS, NB), bool)
    mask[:, :4] = True
    lab, msk = jnp.asarray(labels), jnp.asarray(mask)

    def loss_of(params, batch_stats, image, labels_, mask_):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            image, train=True, mutable=["batch_stats"])
        total, _ = loss_fn(preds, labels_, mask_)
        return total, mut["batch_stats"]

    def base_step(state, image, labels_, mask_):
        import optax
        (total, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params, state.batch_stats,
                                   image, labels_, mask_)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree.map(lambda e, p: e * 0.999 + p * 0.001,
                               state.ema_params, new_params)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt,
                             ema_params=new_ema), total

    def make(aug: bool, rot: float):
        def step(state, seed, image):
            il, ll, ml = image, lab, msk
            if aug:
                key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
                il, ll, ml = device_augment_batch(
                    key, il, ll, ml, mosaic_p=0.5, hsv=True, hflip_p=0.5,
                    vflip_p=0.5, cj_p=0.4, rotate_p=rot)
            return base_step(state, il, ll, ml)
        return jax.jit(step, donate_argnums=0)

    arms = {
        "step": make(False, 0.0),
        "aug_step": make(True, 0.0),
        "rot_step": make(True, 0.7),
    }

    gen = jax.jit(lambda kk: jax.random.uniform(kk, (BS, SIZE, SIZE, 3),
                                                jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    states = {}
    for name, call in arms.items():
        st = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                (SIZE, SIZE), opt, flat=False)
        t0 = time.time()
        st, total = call(st, 0, xs[0])
        assert np.isfinite(float(total)), name
        states[name] = st
        print(f"{name}: compiled+first in {time.time() - t0:.1f}s",
              flush=True)

    results = {n: [] for n in arms}
    j = 0
    for r in range(ROUNDS):
        for name, call in arms.items():
            st = states[name]
            t0 = time.perf_counter()
            for i in range(ITERS):
                st, total = call(st, j * 10 + i, xs[(j + i) % 3])
            assert np.isfinite(float(total))
            states[name] = st
            results[name].append((time.perf_counter() - t0) / ITERS * 1e3)
            j += ITERS
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}ms" for n in results), flush=True)

    med = {n: statistics.median(v) for n, v in results.items()}
    print("\n== medians (ms/step, bs=%d @ %d²) ==" % (BS, SIZE))
    for n, v in med.items():
        print(f"  {n}: {v:.1f}  ({BS / v * 1e3:.0f} img/s)")
    base = med["step"]
    print(f"\nshipped augment set delta: {med['aug_step'] - base:+.1f} ms "
          f"({(med['aug_step'] - base) / base * 100:+.1f}% of step)")
    print(f"+rotate delta:             {med['rot_step'] - med['aug_step']:+.1f} ms "
          f"({(med['rot_step'] - med['aug_step']) / base * 100:+.1f}% of step)")


if __name__ == "__main__":
    main()
