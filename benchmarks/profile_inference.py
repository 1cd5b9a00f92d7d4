"""Inference stage profiler for TPU runs (see .claude/skills/verify gotchas:
distinct on-device inputs, no identical-call reuse, no big uploads)."""
import time
import jax, jax.numpy as jnp
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.decode import decode_predictions
from yolov5m_tpu.ops.nms import batched_nms

bs = 32
model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,640,640,3)))
anchors = jnp.asarray(normalized_anchors())
gen = jax.jit(lambda k: jax.random.uniform(k, (bs,640,640,3), jnp.float32))
xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
jax.block_until_ready(xs)
print("inputs ready", flush=True)

def bench(name, fn, n_rounds=3):
    rs = [fn(x) for x in xs]
    jax.block_until_ready(rs)
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        rs = [fn(x) for x in xs]
    jax.block_until_ready(rs)
    dt = (time.perf_counter()-t0)/(n_rounds*len(xs))
    print(f"{name:30s} {dt*1000:7.2f} ms/batch  {bs/dt:7.1f} img/s", flush=True)

bench("model fwd", jax.jit(lambda x: sum(p.sum() for p in model.apply(variables, x, train=False))))
bench("model+decode+nms(xla,1024)", jax.jit(lambda x: batched_nms(decode_predictions(model.apply(variables, x, train=False), anchors), 0.6, 0.25, 300, 1024)))
bench("model+decode+nms(pallas,1024)", jax.jit(lambda x: batched_nms(decode_predictions(model.apply(variables, x, train=False), anchors), 0.6, 0.25, 300, 1024, backend="pallas")))

from yolov5m_tpu.ops.postprocess import fused_detect
bench("model+fused_detect(xla)", jax.jit(lambda x: fused_detect(model.apply(variables, x, train=False), anchors, conf_threshold=0.25, iou_threshold=0.6)))
for bsz in (64,):
    gen2 = jax.jit(lambda k: jax.random.uniform(k, (bsz,640,640,3), jnp.float32))
    xs2 = [gen2(jax.random.PRNGKey(100+i)) for i in range(8)]
    jax.block_until_ready(xs2)
    f = jax.jit(lambda x: fused_detect(model.apply(variables, x, train=False), anchors, conf_threshold=0.25, iou_threshold=0.6))
    rs = [f(x) for x in xs2]; jax.block_until_ready(rs)
    import time as _t
    t0 = _t.perf_counter()
    for _ in range(3):
        rs = [f(x) for x in xs2]
    jax.block_until_ready(rs)
    dt = (_t.perf_counter()-t0)/(3*len(xs2))
    print(f"fused bs={bsz}: {dt*1000:.2f} ms/batch  {bsz/dt:.1f} img/s", flush=True)
