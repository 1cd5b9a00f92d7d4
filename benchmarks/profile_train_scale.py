"""Train-step scale probe: larger batches + scan-chained micro-steps.

Round-3 facts this probe acts on (benchmarks/profile_train_flat.py):
bs32 ≈ 318 img/s (tree optimizer), flat optimizer is a ~3% loss, and the
per-call dispatch cost is ~4.1ms (profile_dispatch.py). The two remaining
levers toward the 450 img/s goal are (a) batch size — fwd/bwd per-image
cost usually falls toward bs=64 — and (b) chaining K train steps inside
one jit via lax.scan (one dispatch per K steps, the inference bench's
winning shape, with the loader prefetching K batches).

Arms (all tree layout, donated, custom loss):
  bs32        — plain step, accumulate=2 (the earlier baseline)
  bs64        — plain step, accumulate=1
  bs32_scan2  — 2 chained micro-steps per call, accumulate=2
Interleaved rounds (relay lane rule, CLAUDE.md).
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


def _labels(bs):
    labels = np.zeros((bs, 8, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    labels[:, 1] = [2, 0.3, 0.7, 0.1, 0.15]
    mask = np.zeros((bs, 8), bool)
    mask[:, :2] = True
    return jnp.asarray(labels), jnp.asarray(mask)


def main(rounds: int = 8, iters: int = 4):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    loss_fn = YoloLoss(LossConfig.from_config(cfg),
                       np.asarray(ANCHORS, np.float32), kind="custom")

    # round-3 addendum: inference gained +21% from bs64->bs128 (better MXU
    # batch tiling); probe whether train fwd+bwd sees the same. remat arm
    # in case plain bs128 blows HBM (activation stash for the bwd).
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str,
                    default="bs32:32:1,bs64:64:1,bs32_scan2:32:2")
    opt_cli = ap.parse_args()
    specs = []
    for a in opt_cli.arms.split(","):
        parts = a.split(":")          # name:bs:scan[:size]
        specs.append((parts[0], int(parts[1]), int(parts[2]),
                      int(parts[3]) if len(parts) > 3 else 640))

    arms = {}   # name -> [call, state, xs, labels, mask, imgs_per_call]
    for name, bs, scan_k, size in specs:
        if name.endswith("_rall"):
            # remat_scope="all": every CBL/C3/SPPF rematted — the finer
            # stash that can fit bs=256 where C3-only remat OOMs
            arm_model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc,
                               dtype=jnp.bfloat16, remat=True,
                               remat_scope="all")
        elif name.endswith("_remat"):
            arm_model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc,
                               dtype=jnp.bfloat16, remat=True)
        else:
            arm_model = model
        accumulate = accumulation_steps(bs, cfg.nominal_batch_size)
        opt = make_optimizer(cfg)
        state = create_train_state(arm_model, cfg, jax.random.PRNGKey(0),
                                   (size, size), opt, flat=False)
        step = make_train_step(arm_model, loss_fn, opt, accumulate,
                               flat=False)
        labels, mask = _labels(bs)

        if scan_k == 1:
            call = jax.jit(step, donate_argnums=0)
        else:
            def chained(state, xs, labels, mask, _step=step, _k=scan_k):
                def body(st, x):
                    st, m = _step(st, x, labels, mask)
                    return st, m["loss"]
                st, losses = jax.lax.scan(body, state, xs)
                return st, {"loss": losses[-1]}
            call = jax.jit(chained, donate_argnums=0)

        shape = (bs, size, size, 3) if scan_k == 1 \
            else (scan_k, bs, size, size, 3)
        gen = jax.jit(lambda k, s=shape: jax.random.uniform(k, s, jnp.float32))
        n_in = 2 if bs >= 64 else 3   # HBM: bs128 inputs are 629MB each
        xs = [jax.block_until_ready(gen(jax.random.PRNGKey(11 * bs + i)))
              for i in range(n_in)]
        arms[name] = [call, state, xs, labels, mask, bs * scan_k]

    for name in list(arms):
        arm = arms[name]
        t0 = time.time()
        try:
            arm[1], m = arm[0](arm[1], arm[2][0], arm[3], arm[4])
            assert np.isfinite(float(m["loss"]))
            print(f"{name}: compiled+first in {time.time()-t0:.1f}s")
        except (ValueError, TypeError):
            raise   # trace-time bug in the arm, not an OOM — surface it
        except Exception as e:  # e.g. HBM OOM at big batches
            print(f"{name}: DROPPED ({type(e).__name__}: {str(e)[:200]})")
            del arms[name]

    results = {name: [] for name in arms}
    k = 0
    for r in range(rounds):
        for name, arm in arms.items():
            call, state, xs = arm[0], arm[1], arm[2]
            t0 = time.perf_counter()
            for i in range(iters):
                state, m = call(state, xs[(k + i) % len(xs)], arm[3], arm[4])
            assert np.isfinite(float(m["loss"]))
            dt = time.perf_counter() - t0
            arm[1] = state
            k += iters
            results[name].append(arm[5] * iters / dt)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.0f}" for n in results))

    print("\n== median img/s ==")
    for name, vals in results.items():
        print(f"{name}: median {statistics.median(vals):.1f} img/s, "
              f"best {max(vals):.1f}")


if __name__ == "__main__":
    main()
