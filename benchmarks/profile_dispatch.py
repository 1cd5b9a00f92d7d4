"""Quantify per-call dispatch overhead over the relay, and the win from
chaining pipeline iterations INSIDE one jit (lax.scan over stacked batches).

Arms:
  t1_trivial   — acc + x.sum() on a (64,) vector: pure dispatch cost
  t2_pipe1     — full fused pipeline (model+detect), one bs=64 batch/call
  t3_pipe4scan — same pipeline, 4 batches chained inside the jit via scan:
                 per-image cost should drop by ~(dispatch)*3/4 per round
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(bs: int = 64, rounds: int = 10):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())

    def pipe(x, acc):
        preds = model.apply(variables, x + (acc * 0).astype(x.dtype),
                            train=False)
        det, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                                  iou_threshold=cfg.nms_iou_thresh,
                                  max_detections=300, pre_nms_topk=1024)
        return acc + valid.sum().astype(jnp.float32)

    @jax.jit
    def t1(v, acc):
        return acc + (v + acc).sum()

    @jax.jit
    def t2(x, acc):
        return pipe(x, acc)

    @jax.jit
    def t3(xs, acc):   # xs: (4, bs, 640, 640, 3)
        def body(acc, x):
            return pipe(x, acc), ()
        acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    gen = jax.jit(lambda k: jax.random.uniform(
        k, (bs, 640, 640, 3), jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(8)]
    stacked = [jax.block_until_ready(jnp.stack(xs[i:i + 4]))
               for i in (0, 4)]
    tiny = [jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(50 + i), (64,)))
        for i in range(4)]

    arms = {
        "t1_trivial": (t1, tiny, 1),
        "t2_pipe1": (t2, xs, bs),
        "t3_pipe4scan": (t3, stacked, 4 * bs),
    }
    accs = {}
    for name, (arm, data, _) in arms.items():
        t0 = time.time()
        accs[name] = arm(data[0], jnp.float32(0.0))
        float(accs[name])
        print(f"{name}: compiled+first {time.time()-t0:.1f}s")

    results = {n: [] for n in arms}
    iters = {n: (8 if n == "t1_trivial" else 4) for n in arms}
    j = 0
    for _ in range(rounds):
        for name, (arm, data, imgs) in arms.items():
            acc = accs[name]
            it = iters[name]
            t0 = time.perf_counter()
            for i in range(it):
                acc = arm(data[(j + i) % len(data)], acc)
            assert float(acc) == float(acc)
            dt = time.perf_counter() - t0
            accs[name] = acc
            results[name].append((dt / it * 1000, imgs * it / dt))
            j += it

    print("\n== results ==")
    for name, vals in results.items():
        ms = statistics.median([v[0] for v in vals])
        ips = statistics.median([v[1] for v in vals])
        print(f"{name}: {ms:.2f} ms/call, {ips:.1f} img/s")


if __name__ == "__main__":
    main()
