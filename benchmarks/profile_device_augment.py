"""Device-side cost of the on-device augmentation ops, per op.

Round 4 measured what each augmentation actually costs ON DEVICE before
deciding the default --device_augment set (ROUND4_NOTES §9). Arms are
DISTINCT interleaved jitted programs (relay lane rule, CLAUDE.md); `mm`
is a dispatch/lane indicator (a 640³ matmul is ~13 µs of real work, so
its wall time IS the per-call floor). Only ratios to that floor are
meaningful over the relay.

  noop    img.mean() — touches the batch once (bandwidth floor)
  mm      640x640 matmul — dispatch floor / lane health
  hsv     HSV gain jitter (elementwise + trig)
  cj      color jitter (elementwise)
  mosaic  roll-based mosaic-4 at p=1 (bulk shifts + selects, no gather)
  rotate  bilinear warp at p=1 (arbitrary 4-tap gather — the expensive one)
  shipped the default --device_augment --device_mosaic set
          (mosaic 0.5 + HSV + flips + color jitter 0.4; rotate stays host)

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_device_augment.py
"""

import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.ops.augment_device import (color_jitter_batch,
                                            device_augment_batch, hsv_batch,
                                            rotate_batch)
from yolov5m_tpu.ops.mosaic import random_mosaic_batch

BS = 16
SIZE = 640
NB = 16
ITERS = 3
ROUNDS = 8


def main():
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    lab = jnp.zeros((BS, NB, 5))
    msk = jnp.zeros((BS, NB), bool)

    def k(seed):
        return jax.random.fold_in(jax.random.PRNGKey(0), seed)

    arms = {
        "noop": jax.jit(lambda img, s: img.mean() + s * 0.0),
        "mm": jax.jit(lambda img, s: (
            img[0, :, :, 0] @ img[0, :, :, 1]).sum() + s * 0.0),
        "hsv": jax.jit(lambda img, s: hsv_batch(k(s), img).mean()),
        "cj": jax.jit(lambda img, s: color_jitter_batch(
            k(s), img, p=1.0).mean()),
        "mosaic": jax.jit(lambda img, s: random_mosaic_batch(
            k(s), img, lab, msk, p=1.0)[0].mean()),
        "rotate": jax.jit(lambda img, s: rotate_batch(
            k(s), img, lab, msk, p=1.0)[0].mean()),
        "shipped": jax.jit(lambda img, s: device_augment_batch(
            k(s), img, lab, msk, mosaic_p=0.5, hsv=True, hflip_p=0.5,
            vflip_p=0.5, cj_p=0.4)[0].mean()),
    }

    gen = jax.jit(lambda kk: jax.random.uniform(kk, (BS, SIZE, SIZE, 3),
                                                jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(3)]

    for name, call in arms.items():
        t0 = time.time()
        assert np.isfinite(float(call(xs[0], 0)))
        print(f"{name}: compiled+first in {time.time() - t0:.1f}s",
              flush=True)

    results = {n: [] for n in arms}
    j = 0
    for r in range(ROUNDS):
        for name, call in arms.items():
            t0 = time.perf_counter()
            for i in range(ITERS):
                assert np.isfinite(float(call(xs[(j + i) % 3], j * 10 + i)))
            results[name].append((time.perf_counter() - t0) / ITERS * 1e3)
            j += ITERS
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.1f}ms" for n in results), flush=True)

    med = {n: statistics.median(v) for n, v in results.items()}
    floor = med["mm"]
    print("\n== medians (ms/call, bs=%d @ %d²) ==" % (BS, SIZE))
    for n, v in med.items():
        print(f"  {n}: {v:.1f}  ({v / floor:.1f}x of dispatch floor, "
              f"{(v - floor) / BS * 1e3:.0f} us/img over floor)")


if __name__ == "__main__":
    main()
