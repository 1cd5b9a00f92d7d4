"""NMS backend comparison measured as full-pipeline deltas (micro-timings of
small kernels are unreliable over the tunneled TPU; see verify skill)."""
import time
import jax, jax.numpy as jnp
from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.fuse import fold_batchnorm
from yolov5m_tpu.models.yolo import normalized_anchors
from yolov5m_tpu.ops.postprocess import fused_detect

bs = 64
base = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16)
variables = fold_batchnorm(base.init(jax.random.PRNGKey(0), jnp.zeros((1,640,640,3))))
model = YOLOv5(first_out=48, nc=80, dtype=jnp.bfloat16, fused=True)
anchors = jnp.asarray(normalized_anchors())
gen = jax.jit(lambda k: jax.random.uniform(k, (bs,640,640,3), jnp.float32))
xs = [gen(jax.random.PRNGKey(i)) for i in range(8)]
jax.block_until_ready(xs)

def bench(name, fn, n_rounds=3):
    rs = [fn(x) for x in xs]
    jax.block_until_ready(rs)
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        rs = [fn(x) for x in xs]
    jax.block_until_ready(rs)
    dt = (time.perf_counter()-t0)/(n_rounds*len(xs))
    print(f"{name:28s} {dt*1000:7.2f} ms/batch  {bs/dt:7.1f} img/s", flush=True)

for backend in ("xla", "xla_loop", "pallas"):
    f = jax.jit(lambda x, b=backend: fused_detect(
        model.apply(variables, x, train=False), anchors,
        conf_threshold=0.25, iou_threshold=0.6, pre_nms_topk=1024, backend=b))
    bench(f"pipeline nms={backend}", f)
