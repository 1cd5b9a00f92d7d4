"""Measure the live-BN tax on the train step (VERDICT r3 #5).

Train forward runs live BatchNorm (batch statistics computed per step);
inference runs folded BN. Round-3 observed live-BN train fwd ~1.9x the
folded inference fwd but never isolated how much of the ~99ms bs32 step is
the BN-STATISTICS work specifically (the stat reductions in the forward +
the backward through the normalization statistics). That number decides
whether a fused conv+BN+SiLU custom-VJP Pallas kernel is worth building.

A/B by construction, not trace attribution: four jitted programs that are
IDENTICAL except for BN mode — the deltas are exactly the BN-stat cost.

  step_live    full train step (grad+Adam+EMA), BN train=True (live stats)
  step_frozen  same step, BN train=False (running averages = constants;
               gradients still flow through BN scale/bias and all convs,
               but no stat reductions and an elementwise BN backward)
  fwd_live     loss value only (no grad), BN train=True
  fwd_frozen   loss value only (no grad), BN train=False

  BN tax total      = step_live - step_frozen
  BN tax (forward)  = fwd_live  - fwd_frozen
  BN tax (backward) = total - forward

Four distinct programs interleaved per round also satisfies the relay lane
rule (CLAUDE.md). Per-call dispatch (~4.1ms) cancels in the deltas.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_bn_tax.py
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolov5m_tpu.config import ANCHORS, Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.train import LossConfig, YoloLoss
from yolov5m_tpu.train.trainer import create_train_state, make_optimizer

BS = 32
SIZE = 640
ITERS = 4


def _labels(bs):
    labels = np.zeros((bs, 8, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    labels[:, 1] = [2, 0.3, 0.7, 0.1, 0.15]
    mask = np.zeros((bs, 8), bool)
    mask[:, :2] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def make_step(model, loss_fn, optimizer, live: bool):
    def loss_of(params, batch_stats, image, labels, mask):
        if live:
            preds, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                image, train=True, mutable=["batch_stats"])
            stats = mut["batch_stats"]
        else:
            preds = model.apply(
                {"params": params, "batch_stats": batch_stats},
                image, train=False)
            stats = batch_stats
        total, parts = loss_fn(preds, labels, mask)
        return total, stats

    def step(state, image, labels, mask):
        (total, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params, state.batch_stats,
                                   image, labels, mask)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = 0.999
        new_ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                               state.ema_params, new_params)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats, opt_state=new_opt,
                             ema_params=new_ema), total

    def fwd_only(state, image, labels, mask):
        total, _ = loss_of(state.params, state.batch_stats, image, labels,
                           mask)
        return state.replace(step=state.step + 1), total

    return step, fwd_only


def main(rounds=10):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig.from_config(cfg),
                       np.asarray(ANCHORS, np.float32), kind="custom")
    opt = make_optimizer(cfg)

    step_l, fwd_l = make_step(model, loss_fn, opt, live=True)
    step_f, fwd_f = make_step(model, loss_fn, opt, live=False)
    arms = {
        "step_live": jax.jit(step_l, donate_argnums=0),
        "step_frozen": jax.jit(step_f, donate_argnums=0),
        "fwd_live": jax.jit(fwd_l, donate_argnums=0),
        "fwd_frozen": jax.jit(fwd_f, donate_argnums=0),
    }
    labels, mask = _labels(BS)
    gen = jax.jit(lambda k: jax.random.uniform(k, (BS, SIZE, SIZE, 3),
                                               jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    states = {}
    for name, call in arms.items():
        st = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                (SIZE, SIZE), opt, flat=False)
        t0 = time.time()
        st, total = call(st, xs[0], labels, mask)
        assert np.isfinite(float(total)), name
        states[name] = st
        print(f"{name}: compiled+first in {time.time() - t0:.1f}s")

    results = {n: [] for n in arms}
    k = 0
    for r in range(rounds):
        for name, call in arms.items():
            st = states[name]
            t0 = time.perf_counter()
            for i in range(ITERS):
                st, total = call(st, xs[(k + i) % len(xs)], labels, mask)
            assert np.isfinite(float(total))
            dt = time.perf_counter() - t0
            states[name] = st
            k += ITERS
            results[name].append(dt / ITERS * 1e3)   # ms/call
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}ms" for n in results))

    med = {n: statistics.median(v) for n, v in results.items()}
    print("\n== medians (ms/call, incl ~4.1ms dispatch) ==")
    for n, v in med.items():
        print(f"  {n}: {v:.2f}")
    tax_total = med["step_live"] - med["step_frozen"]
    tax_fwd = med["fwd_live"] - med["fwd_frozen"]
    print(f"\nBN-stat tax: total {tax_total:.2f} ms/step "
          f"({tax_total / med['step_live'] * 100:.1f}% of live step), "
          f"forward {tax_fwd:.2f} ms, backward {tax_total - tax_fwd:.2f} ms")
    print(f"live step {med['step_live']:.1f} ms -> "
          f"{BS / med['step_live'] * 1e3:.0f} img/s; frozen-BN bound "
          f"{BS / med['step_frozen'] * 1e3:.0f} img/s")


if __name__ == "__main__":
    main()
