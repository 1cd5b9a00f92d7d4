"""Loss-only fwd+bwd cost on fixed preds (grad wrt preds)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from yolov5m_tpu.config import ANCHORS
from yolov5m_tpu.train import LossConfig, YoloLoss

bs, nb = 16, 120
shapes = [(bs, 3, 80, 80, 85), (bs, 3, 40, 40, 85), (bs, 3, 20, 20, 85)]
gen = jax.jit(lambda k: [jax.random.normal(k, s, jnp.float32) for s in shapes])
preds_sets = [gen(jax.random.PRNGKey(i)) for i in range(10)]
jax.block_until_ready(preds_sets)

labels = jnp.tile(jnp.asarray([[1, .5, .5, .2, .3]], jnp.float32)[None], (bs, nb, 1))
# realistic density: 20 valid boxes per image
mask20 = jnp.zeros((bs, nb), bool).at[:, :20].set(True)
mask_full = jnp.ones((bs, nb), bool)

for kind in ("custom", "ultralytics"):
    loss_fn = YoloLoss(LossConfig(nc=80), np.asarray(ANCHORS, np.float32), kind=kind)
    for name, m in (("20 boxes", mask20), ("120 boxes", mask_full)):
        g = jax.jit(lambda ps, mm: jax.grad(
            lambda q: loss_fn(q, labels, mm)[0])(ps))
        r = g(preds_sets[0], m); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(1, 9):   # each distinct preds used once (no relay cache)
            r = g(preds_sets[i], m)
        jax.block_until_ready(r)
        print(f"{kind:12s} {name:10s} loss fwd+bwd: {(time.perf_counter()-t0)/8*1000:6.1f} ms", flush=True)
