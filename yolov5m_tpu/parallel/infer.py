"""Data-parallel batch inference (serving) over a jax.sharding.Mesh.

The serving counterpart of parallel/dp.py: the fused inference pipeline
(forward + decode + NMS, ops/postprocess.py fused_detect) runs shard_mapped
over a 1-D "data" mesh — params replicated, the batch axis sharded — so N
chips serve N× the single-chip throughput with zero cross-device
communication (detection is embarrassingly batch-parallel; XLA emits no
collectives for this program).

The reference has no multi-device serving at all (single-device torch,
SURVEY.md §2); this is the scale-out path the north star's
images/sec/chip metric multiplies across. Multi-host works the same way as
training: assemble the global batch with shard_batch (parallel/dp.py) and
every host fetches only its local output shard.

Use bs-per-device = 128 — the measured single-chip throughput optimum
(benchmarks/profile_batchsize.py; CLAUDE.md performance facts).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_infer_fn(model, variables, anchors_norm, mesh: Mesh,
                     axis: str = "data",
                     strides: Tuple[int, ...] = (8, 16, 32),
                     conf_threshold: float = 0.25,
                     iou_threshold: float = 0.45,
                     max_detections: int = 300,
                     pre_nms_topk: int = 1024,
                     backend: str = "auto") -> Callable:
    """Build a jitted DP inference function `(images) -> (det, valid)`.

    model/variables: a fused (BN-folded) or plain YOLOv5 + its variables —
    anything `model.apply(variables, x, train=False)` accepts.
    images: (bs, H, W, 3) with bs divisible by the mesh size; place with
    `shard_batch({"image": x}, mesh)["image"]` (single-host device_put of a
    host array also works — jit reshards as needed, at a transfer cost).

    Returns per-image (bs, max_detections, 6) [class, conf, x1 y1 x2 y2]
    and a (bs, max_detections) valid mask, batch-sharded over the mesh.
    """
    from yolov5m_tpu.ops.postprocess import fused_detect

    anchors_norm = jnp.asarray(anchors_norm)

    def infer_shard(image):
        preds = model.apply(variables, image, train=False)
        return fused_detect(preds, anchors_norm, strides=strides,
                            conf_threshold=conf_threshold,
                            iou_threshold=iou_threshold,
                            max_detections=max_detections,
                            pre_nms_topk=pre_nms_topk, backend=backend)

    sharded = shard_map(
        infer_shard,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        # no collectives inside: each device runs its batch shard alone
        check_vma=False,
    )

    out_sharding = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, out_shardings=(out_sharding, out_sharding))
    def dp_infer(images):
        return sharded(images)

    return dp_infer
