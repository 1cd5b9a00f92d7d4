"""Gate+top_k stage variants at bs=64, N=25200, K=1024.

The stage decomposition (profile_postprocess.py) shows gate+top_k is ~70%
of the fused postprocess (7.4 of ~10.6 ms). Variants measured here:

  a_flat_exact    — concat full (bs,N,85) + lax.top_k on gated obj (current)
  b_obj_exact     — concat ONLY the obj channel (bs,N) + lax.top_k
                    (drops the 274MB flat materialization from the gate)
  c_obj_approx95  — obj-only + lax.approx_max_k (recall_target 0.95)
  d_obj_approx99  — obj-only + approx_max_k (recall_target 0.99)
  e_scale_gather  — b + per-scale row gather (no flat tensor anywhere)

Interleaved arms, chained accumulators (relay lane rule, CLAUDE.md).
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.ops.nms import NEG_INF

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(bs: int = 64, k: int = 1024, rounds: int = 10, iters: int = 8):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    no = 85
    grid_sizes = [(80, 80), (40, 40), (20, 20)]
    sizes = [3 * gy * gx for gy, gx in grid_sizes]
    starts = np.cumsum([0] + sizes)
    logit_thresh = float(np.log(0.25 / 0.75))

    gen = jax.jit(lambda key: [
        jax.random.normal(k2, (bs, 3, gy, gx, no), jnp.bfloat16)
        for k2, (gy, gx) in zip(jax.random.split(key, 3), grid_sizes)])
    preds_sets = [jax.block_until_ready(gen(jax.random.PRNGKey(i)))
                  for i in range(4)]

    def gated_obj(preds, acc):
        obj = jnp.concatenate(
            [p[..., 4].reshape(bs, -1) for p in preds],
            axis=1).astype(jnp.float32) + acc * 0
        return jnp.where(obj > logit_thresh, obj, NEG_INF)

    def a_flat_exact(preds, acc):
        flat = jnp.concatenate([p.reshape(bs, -1, no) for p in preds], axis=1)
        obj = flat[..., 4].astype(jnp.float32) + acc * 0
        gated = jnp.where(obj > logit_thresh, obj, NEG_INF)
        tl, ti = jax.lax.top_k(gated, k)
        rows = jnp.take_along_axis(flat, ti[..., None], axis=1)
        return acc + rows.astype(jnp.float32).sum() + tl.sum()

    def b_obj_exact(preds, acc):
        gated = gated_obj(preds, acc)
        tl, ti = jax.lax.top_k(gated, k)
        flat = jnp.concatenate([p.reshape(bs, -1, no) for p in preds], axis=1)
        rows = jnp.take_along_axis(flat, ti[..., None], axis=1)
        return acc + rows.astype(jnp.float32).sum() + tl.sum()

    def approx(preds, acc, recall):
        gated = gated_obj(preds, acc)
        tl, ti = jax.lax.approx_max_k(gated, k, recall_target=recall)
        flat = jnp.concatenate([p.reshape(bs, -1, no) for p in preds], axis=1)
        rows = jnp.take_along_axis(flat, ti[..., None], axis=1)
        return acc + rows.astype(jnp.float32).sum() + tl.sum()

    def e_scale_gather(preds, acc):
        gated = gated_obj(preds, acc)
        tl, ti = jax.lax.approx_max_k(gated, k, recall_target=0.95)
        rows = jnp.zeros((bs, k, no), jnp.float32)
        for s, p in enumerate(preds):
            flat_s = p.reshape(bs, -1, no)
            in_s = (ti >= starts[s]) & (ti < starts[s + 1])
            idx = jnp.clip(ti - starts[s], 0, sizes[s] - 1)
            r = jnp.take_along_axis(flat_s, idx[..., None], axis=1)
            rows = jnp.where(in_s[..., None], r.astype(jnp.float32), rows)
        return acc + rows.sum() + tl.sum()

    arms = {
        "a_flat_exact": jax.jit(a_flat_exact),
        "b_obj_exact": jax.jit(b_obj_exact),
        "c_obj_approx95": jax.jit(lambda p, a: approx(p, a, 0.95)),
        "d_obj_approx99": jax.jit(lambda p, a: approx(p, a, 0.99)),
        "e_scale_gather": jax.jit(e_scale_gather),
    }

    accs = {}
    for name, arm in arms.items():
        t0 = time.time()
        accs[name] = arm(preds_sets[0], jnp.float32(0.0))
        float(accs[name])
        print(f"{name}: compiled+first {time.time()-t0:.1f}s")

    results = {n: [] for n in arms}
    j = 0
    for _ in range(rounds):
        for name, arm in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                acc = arm(preds_sets[(j + i) % len(preds_sets)], acc)
            assert float(acc) == float(acc)
            results[name].append((time.perf_counter() - t0) / iters * 1000)
            accs[name] = acc
            j += iters

    print(f"\n== per-call ms (bs={bs}, N={sum(sizes)}, K={k}) ==")
    for name, vals in results.items():
        print(f"{name}: median {statistics.median(vals):.2f} "
              f"(min {min(vals):.2f})")


if __name__ == "__main__":
    main()
