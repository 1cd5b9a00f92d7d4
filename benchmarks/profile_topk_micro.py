"""Micro-isolation of the gate+top_k stage cost (see
profile_topk_variants.py — all macro variants sit at ~8ms, so the cost is
in a shared component, not the top_k algorithm choice).

Arms:
  m1_obj_extract — sum(gated obj) only: reads the (bs,3,gy,gx,85) preds and
                   extracts channel 4 (minor-dim single-lane read)
  m2_read_all    — sum(preds): full-tensor read at full lane efficiency
  m3_topk_only   — lax.top_k over a precomputed (bs,N) f32 input
  m4_approx_only — approx_max_k over the same
  m5_gather_only — take_along_axis of 1024 rows from a precomputed flat
                   (bs,N,85) tensor with precomputed indices
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.ops.nms import NEG_INF

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(bs: int = 64, k: int = 1024, rounds: int = 10, iters: int = 8):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    no = 85
    grid_sizes = [(80, 80), (40, 40), (20, 20)]
    n = sum(3 * gy * gx for gy, gx in grid_sizes)
    logit_thresh = -1.0986

    gen = jax.jit(lambda key: [
        jax.random.normal(k2, (bs, 3, gy, gx, no), jnp.bfloat16)
        for k2, (gy, gx) in zip(jax.random.split(key, 3), grid_sizes)])
    preds_sets = [jax.block_until_ready(gen(jax.random.PRNGKey(i)))
                  for i in range(4)]
    gen_obj = jax.jit(lambda key: jax.random.normal(key, (bs, n), jnp.float32))
    objs = [jax.block_until_ready(gen_obj(jax.random.PRNGKey(100 + i)))
            for i in range(4)]
    gen_flat = jax.jit(
        lambda key: jax.random.normal(key, (bs, n, no), jnp.bfloat16))
    flats = [jax.block_until_ready(gen_flat(jax.random.PRNGKey(200 + i)))
             for i in range(4)]
    import numpy as np
    idx = jnp.asarray(np.random.default_rng(0).choice(n, (bs, k)))

    def m1(preds, acc):
        obj = jnp.concatenate(
            [p[..., 4].reshape(bs, -1) for p in preds],
            axis=1).astype(jnp.float32) + acc * 0
        return acc + jnp.where(obj > logit_thresh, obj, NEG_INF).sum()

    def m2(preds, acc):
        return acc + sum(p.astype(jnp.float32).sum() for p in preds) + acc * 0

    def m3(obj, acc):
        tl, ti = jax.lax.top_k(obj + acc * 0, k)
        return acc + tl.sum() + ti.sum().astype(jnp.float32)

    def m4(obj, acc):
        tl, ti = jax.lax.approx_max_k(obj + acc * 0, k, recall_target=0.95)
        return acc + tl.sum() + ti.sum().astype(jnp.float32)

    def m5(flat, acc):
        rows = jnp.take_along_axis(flat + (acc * 0).astype(flat.dtype),
                                   idx[..., None], axis=1)
        return acc + rows.astype(jnp.float32).sum()

    arms = {
        "m1_obj_extract": (jax.jit(m1), preds_sets),
        "m2_read_all": (jax.jit(m2), preds_sets),
        "m3_topk_only": (jax.jit(m3), objs),
        "m4_approx_only": (jax.jit(m4), objs),
        "m5_gather_only": (jax.jit(m5), flats),
    }

    accs = {}
    for name, (arm, data) in arms.items():
        t0 = time.time()
        accs[name] = arm(data[0], jnp.float32(0.0))
        float(accs[name])
        print(f"{name}: compiled+first {time.time()-t0:.1f}s")

    results = {nm: [] for nm in arms}
    j = 0
    for _ in range(rounds):
        for name, (arm, data) in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                acc = arm(data[(j + i) % len(data)], acc)
            assert float(acc) == float(acc)
            results[name].append((time.perf_counter() - t0) / iters * 1000)
            accs[name] = acc
            j += iters

    print(f"\n== per-call ms (bs={bs}, N={n}, K={k}) ==")
    for name, vals in results.items():
        print(f"{name}: median {statistics.median(vals):.2f} "
              f"(min {min(vals):.2f})")


if __name__ == "__main__":
    main()
