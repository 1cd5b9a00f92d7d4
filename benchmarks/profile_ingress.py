"""Input-ingress tax A/B (the targeted rewrite from the VERDICT r3 #4
fusion diagnosis, benchmarks/profile_fusion_diag.py).

The op-level trace showed the f32 (128,640,640,3) input costs ~3.7 ms of
the 58.6 ms device forward in pure input processing: an f32->bf16 convert
fusion (~1.4 ms, 691 GB/s) plus a 629 MB layout copy into the first
conv's preferred tiled layout (~2.3 ms, 546 GB/s). Neither touches the
model math — it is ingress tax. Four e2e arms (full fused pipeline incl.
NMS, identical protocol shape to bench.py) isolate it:

  f32       inputs as today's bench: f32, default row-major layout
  u8        uint8 inputs + on-device normalize (x/255 -> bf16): the
            production serving ingress (serving/server.py ships uint8
            over PCIe already; 4x less transfer AND less device traffic)
  f32_auto  f32 inputs pre-staged in the layout XLA chooses under
            Layout.AUTO — deletes the relayout copy, keeps the convert
  u8_auto   uint8 + AUTO layout — deletes both; pure-compute ceiling
  u8_lc     uint8 row-major in, with_layout_constraint(normalized_x,
            conv-preferred layout) INSIDE the jit — tests whether XLA can
            fuse the u8->bf16 convert into a direct tiled-layout write
            (one pass) instead of convert-then-copy (two passes). If it
            wins, the gain is realizable in ONE program with row-major
            ingress, i.e. honestly, in production serving.

Arm subset selectable: INGRESS_ARMS=f32,u8,u8_lc (comma list).

AUTO-layout caveat for serving guidance: a real host DMA delivers
row-major bytes, so per-batch SOMEONE pays a relayout unless the feed is
staged on device ahead of time (depth-1 pipelining in serving/server.py
can overlap it); the u8 arm (row-major uint8 in, relayout on device) is
the honest production number, the *_auto arms bound the ceiling.

  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_ingress.py
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp
from jax.experimental.layout import (Format, Layout,
                                     with_layout_constraint)

# the first conv's preferred input layout, read off the compiled HLO
# (benchmarks/profile_fusion_diag.py dump: %copy = bf16[128,640,640,3]
# {0,3,2,1:T(4,128)(2,1)} — the 629 MB relayout this probe targets)
CONV_INPUT_LAYOUT = Layout(major_to_minor=(0, 3, 2, 1),
                           tiling=((4, 128), (2, 1)))

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

BS = 128
CHAIN_LEN = 2
SEG_CALLS = 2
ROUNDS = 12


def main():
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = fold_batchnorm(
        base.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3))))
    model = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16,
                   fused=True)
    anchors = jnp.asarray(normalized_anchors())
    v_dev = jax.device_put(variables)

    def pipeline(v, x, acc, constrain=False):
        # uint8 ingress: normalize on device exactly like serving/server.py
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        if constrain:
            x = with_layout_constraint(x, CONV_INPUT_LAYOUT)
        preds = model.apply(v, x + (acc * 0).astype(x.dtype), train=False)
        det, valid = fused_detect(
            preds, anchors, conf_threshold=0.25,
            iou_threshold=cfg.nms_iou_thresh,
            max_detections=cfg.max_detections,
            pre_nms_topk=cfg.topk_for_conf(0.25))
        return acc + valid.sum().astype(jnp.float32)

    def make_arm(auto_layout, constrain=False):
        def arm(v, xs, acc):
            def body(acc, x):
                return pipeline(v, x, acc, constrain=constrain), ()
            acc, _ = jax.lax.scan(body, acc, xs)
            return acc
        if auto_layout:
            return jax.jit(arm, in_shardings=(None, Format(Layout.AUTO),
                                              None))
        return jax.jit(arm)

    gen_f32 = jax.jit(lambda k: jax.random.uniform(
        k, (CHAIN_LEN, BS, 640, 640, 3), jnp.float32))
    gen_u8 = jax.jit(lambda k: jax.random.randint(
        k, (CHAIN_LEN, BS, 640, 640, 3), 0, 256, jnp.uint8))

    specs = {                       # name -> (gen, auto_layout, constrain)
        "f32": (gen_f32, False, False),
        "u8": (gen_u8, False, False),
        "f32_auto": (gen_f32, True, False),
        "u8_auto": (gen_u8, True, False),
        "u8_lc": (gen_u8, False, True),
    }
    sel = os.environ.get("INGRESS_ARMS",
                         "f32,u8,f32_auto,u8_auto").split(",")
    arms = {}
    for name in sel:
        gen, auto, constrain = specs[name]
        xs = [jax.block_until_ready(gen(jax.random.PRNGKey(10 * i + 1)))
              for i in range(2)]
        call = make_arm(auto, constrain)
        t0 = time.time()
        if auto:
            compiled = call.lower(v_dev, xs[0], jnp.float32(0)).compile()
            fmt = compiled.input_formats[0][1]
            print(f"{name}: AUTO chose layout "
                  f"{fmt.layout.major_to_minor}/{fmt.layout.tiling}")
            xs = [jax.block_until_ready(jax.device_put(x, fmt)) for x in xs]
            call = compiled
        acc = call(v_dev, xs[0], jnp.float32(0))
        float(acc)
        print(f"{name}: compiled+first in {time.time() - t0:.1f}s")
        arms[name] = [call, xs, acc]

    results = {n: [] for n in arms}
    k = 0
    for r in range(ROUNDS):
        for name, arm in arms.items():
            call, xs, acc = arm
            t0 = time.perf_counter()
            for _ in range(SEG_CALLS):
                acc = call(v_dev, xs[k % len(xs)], acc)
                k += 1
            assert float(acc) >= 0.0
            dt = time.perf_counter() - t0
            arm[2] = acc
            results[name].append(BS * CHAIN_LEN * SEG_CALLS / dt)
        print(f"round {r}: " + "  ".join(
            f"{n}={results[n][-1]:.0f}" for n in results))

    print("\n== median img/s (2-round warmup dropped) ==")
    base_med = statistics.median(results["f32"][2:])
    for n, vals in results.items():
        med = statistics.median(vals[2:])
        print(f"  {n}: {med:.1f} img/s ({med / base_med:.3f}x of f32)")


if __name__ == "__main__":
    main()
