"""Postprocess stage decomposition at bs=64: where do the ~14 ms of
gate+decode+NMS go?

Cumulative-stage arms (each arm = pipeline truncated after a stage), all
distinct jitted programs interleaved per round (relay lane rule, CLAUDE.md).
Stage costs are adjacent-arm deltas. Inputs are pre-generated random
prediction tensors; an accumulator chains calls so nothing is replayable.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_postprocess.py
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.config import Config
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.nms import (
    NEG_INF, _compact, _greedy_suppress_fixpoint, _suppress_matrix)
from yolov5m_tpu.ops.postprocess import _row_tables, fused_detect

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(bs: int = 64, k: int = 1024, rounds: int = 10, iters: int = 8):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    nc = cfg.nc
    no = 5 + nc
    anchors = jnp.asarray(normalized_anchors())
    grid_sizes = [(80, 80), (40, 40), (20, 20)]
    strides = (8, 16, 32)
    logit_thresh = float(np.log(0.25 / 0.75))

    gen = jax.jit(lambda key: [
        jax.random.normal(k2, (bs, 3, gy, gx, no), jnp.bfloat16)
        for k2, (gy, gx) in zip(jax.random.split(key, 3), grid_sizes)])
    preds_sets = [jax.block_until_ready(gen(jax.random.PRNGKey(i)))
                  for i in range(4)]

    gxy, awh, std = (np.asarray(t) for t in _row_tables(
        grid_sizes, np.asarray(normalized_anchors()), strides))

    def stage_gate(preds, acc):
        flat = jnp.concatenate([p.reshape(bs, -1, no) for p in preds], axis=1)
        obj = flat[..., 4].astype(jnp.float32) + acc * 0
        gated = jnp.where(obj > logit_thresh, obj, NEG_INF)
        top_logits, top_idx = jax.lax.top_k(gated, k)
        return flat, top_logits, top_idx

    def stage_decode(preds, acc):
        flat, top_logits, top_idx = stage_gate(preds, acc)
        valid = top_logits > NEG_INF / 2
        rows = jnp.take_along_axis(flat, top_idx[..., None], axis=1)
        rows = rows.astype(jnp.float32)
        g = jnp.asarray(gxy)[top_idx]
        a = jnp.asarray(awh)[top_idx]
        s = jnp.asarray(std)[top_idx][..., None]
        xy = (2.0 * jax.nn.sigmoid(rows[..., 0:2]) + g - 0.5) * s
        wh = (2.0 * jax.nn.sigmoid(rows[..., 2:4])) ** 2 * a
        conf = jax.nn.sigmoid(top_logits)
        cls = jnp.argmax(rows[..., 5:], axis=-1).astype(jnp.float32)
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        return boxes, cls, conf, valid

    arms = {}

    def make(fn):
        return jax.jit(fn)

    arms["a_gate_topk"] = make(
        lambda preds, acc: acc + stage_gate(preds, acc)[2].sum().astype(
            jnp.float32))
    arms["b_plus_decode"] = make(
        lambda preds, acc: acc + stage_decode(preds, acc)[0].sum().astype(
            jnp.float32))

    def full_xla(preds, acc):
        boxes, cls, conf, valid = stage_decode(preds, acc)
        keep = _greedy_suppress_fixpoint(
            _suppress_matrix(boxes, cls, cfg.nms_iou_thresh), valid)
        import functools
        out, v = jax.vmap(functools.partial(_compact, max_detections=300))(
            boxes, cls, conf, keep)
        return acc + v.sum().astype(jnp.float32)

    arms["c_full_xla"] = make(full_xla)

    def full_backend(backend):
        def f(preds, acc):
            preds = [p + (acc * 0).astype(p.dtype) for p in preds]
            det, v = fused_detect(preds, anchors, conf_threshold=0.25,
                                  iou_threshold=cfg.nms_iou_thresh,
                                  max_detections=300, pre_nms_topk=k,
                                  backend=backend)
            return acc + v.sum().astype(jnp.float32)
        return make(f)

    if jax.devices()[0].platform != "cpu":
        arms["d_full_pallas"] = full_backend("pallas")

    accs = {}
    for name, arm in arms.items():
        t0 = time.time()
        accs[name] = arm(preds_sets[0], jnp.float32(0.0))
        float(accs[name])
        print(f"{name}: compiled+first {time.time()-t0:.1f}s")

    results = {n: [] for n in arms}
    j = 0
    for r in range(rounds):
        for name, arm in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            for i in range(iters):
                acc = arm(preds_sets[(j + i) % len(preds_sets)], acc)
            assert float(acc) == float(acc)
            dt = time.perf_counter() - t0
            accs[name] = acc
            results[name].append(dt / iters * 1000)
            j += iters

    print(f"\n== per-call ms (bs={bs}, K={k}), median over {rounds} rounds ==")
    meds = {}
    for name, vals in results.items():
        meds[name] = statistics.median(vals)
        print(f"{name}: {meds[name]:.2f} ms  (min {min(vals):.2f})")
    if "b_plus_decode" in meds:
        print(f"\ntop_k stage:    {meds['a_gate_topk']:.2f} ms")
        print(f"gather+decode:  {meds['b_plus_decode']-meds['a_gate_topk']:.2f} ms")
        print(f"suppress+compact(xla): {meds['c_full_xla']-meds['b_plus_decode']:.2f} ms")
        if "d_full_pallas" in meds:
            print(f"full pallas vs full xla: {meds['d_full_pallas']:.2f} vs "
                  f"{meds['c_full_xla']:.2f} ms")


if __name__ == "__main__":
    main()
