"""Full-pipeline A/B: bf16 vs int8 activation chain vs legacy per-block
int8, all in the one-dispatch scan shape (4 chained bs=64 batches/call).

Round-2 finding: per-block int8 (bf16 activations between blocks) measured
0.58x of bf16 end-to-end despite raw int8 convs probing 1.4-1.7x — the
quant/dequant elementwise round-trips ate the MXU win. The chain keeps
activations int8 across blocks (blocks.CBL.chain); this is the decisive
measurement for whether int8 becomes the headline serving configuration.
"""

import os
import statistics
import time

import jax
import jax.numpy as jnp

from yolov5m_tpu.config import Config
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.quantize import quantize_int8
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(bs: int = 64, chain_len: int = 4, rounds: int = 12):
    from yolov5m_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    cfg = Config()
    base = YOLOv5(first_out=cfg.first_out, nc=cfg.nc, dtype=jnp.bfloat16)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 640, 640, 3), jnp.float32))
    anchors = jnp.asarray(normalized_anchors())

    calib = [jax.random.uniform(jax.random.PRNGKey(90 + i),
                                (2, 640, 640, 3), jnp.float32)
             for i in range(2)]
    fused_vars = fold_batchnorm(variables)
    fused_model = base.clone(fused=True)
    q_chain_model, q_chain_vars = quantize_int8(base, variables, calib,
                                                chain=True)
    q_block_model, q_block_vars = quantize_int8(base, variables, calib,
                                                chain=False)

    def make_arm(m, v):
        @jax.jit
        def arm(xs, acc):
            def body(acc, x):
                preds = m.apply(v, x + (acc * 0).astype(x.dtype),
                                train=False)
                det, valid = fused_detect(
                    preds, anchors, conf_threshold=0.25,
                    iou_threshold=cfg.nms_iou_thresh,
                    max_detections=300, pre_nms_topk=cfg.pre_nms_topk)
                return acc + valid.sum().astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, acc, xs)
            return acc
        return arm

    arms = {
        "bf16": make_arm(fused_model, fused_vars),
        "int8_chain": make_arm(q_chain_model, q_chain_vars),
        "int8_block": make_arm(q_block_model, q_block_vars),
    }

    gen = jax.jit(lambda k: jax.random.uniform(
        k, (chain_len, bs, 640, 640, 3), jnp.float32))
    xs = [jax.block_until_ready(gen(jax.random.PRNGKey(i))) for i in range(2)]

    accs = {}
    for name, arm in arms.items():
        t0 = time.time()
        accs[name] = arm(xs[0], jnp.float32(0.0))
        float(accs[name])
        print(f"{name}: compiled+first {time.time()-t0:.1f}s")

    results = {n: [] for n in arms}
    j = 0
    for _ in range(rounds):
        for name, arm in arms.items():
            acc = accs[name]
            t0 = time.perf_counter()
            acc = arm(xs[j % len(xs)], acc)
            assert float(acc) >= 0
            dt = time.perf_counter() - t0
            accs[name] = acc
            results[name].append(bs * chain_len / dt)
            j += 1

    print(f"\n== img/s (bs={bs}, scan {chain_len}) ==")
    med = {}
    for name, vals in results.items():
        med[name] = statistics.median(vals)
        print(f"{name}: median {med[name]:.1f} (max {max(vals):.1f})")
    print(f"\nint8_chain vs bf16: {med['int8_chain']/med['bf16']:.3f}x")
    print(f"int8_block vs bf16: {med['int8_block']/med['bf16']:.3f}x")


if __name__ == "__main__":
    main()
