"""Spatially-partitioned (SP) inference: GSPMD halo-exchange sharding.

parallel/infer.py scales THROUGHPUT (more images per second: batch rows
sharded over "data", zero communication). This module scales LATENCY (fewer
milliseconds for ONE image): the conv grid's row axis (H) is sharded over a
"spatial" mesh axis, so every convolution runs on 1/N of the rows per chip
and XLA's GSPMD partitioner inserts the halo exchanges (collective-permutes
of the kernel-overlap boundary rows) that every spatial-window op needs —
the 6x6 stem, 3x3 convs, stride-2 downsamples, SPPF 5x5 max-pools,
nearest-2x upsamples. No manual ppermute choreography: the sharding
annotations ARE the distributed program. This is the idiomatic TPU
spatial-partitioning design (the machinery XLA grew for large-image
segmentation/detection models); the reference is single-GPU torch with no
equivalent (SURVEY.md §2).

When to use which (production guidance):
  * batch >= mesh size → DP (make_dp_infer_fn): perfect scaling, no comms.
  * batch < mesh size (a bs=1 video/robotics stream) → SP: DP would leave
    chips idle; SP splits each image's rows across them.
  * in between → a 2-D mesh ("data", "spatial"): batch over "data", rows
    over "spatial", composed in ONE jit (make_sp_mesh below).

Scaling guidance below is PROJECTED, not measured: this repo's dev
environment has one physical TPU chip, so SP correctness is pinned on the
virtual 8-device CPU mesh (tests/test_sp_infer.py, tests/test_sp_train.py
incl. an f64 exactness proof) while the ICI-traffic arithmetic has no
hardware measurement behind it. Projected model: halo traffic rides ICI and
is tiny relative to conv FLOPs at 640² (a 3x3 conv exchanges one boundary
row per shard edge). Efficiency falls once per-shard rows approach the
kernel window, so keep rows-per-shard >= 2 at the deepest grid: 640² has a
20-row P5 grid, supporting n_spatial <= 8 (each P5 shard keeps >= 2 rows);
past that the halo IS the shard.

The postprocess (flatten + top-k + NMS) is global over all cells, so the
head logits (bs, na, ny, nx, 5+nc) are re-gathered to batch sharding first;
they are ~100x smaller than the early conv activations, so the all-gather
is projected cheap relative to the conv savings (same caveat: unmeasured
on multi-chip hardware).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_mesh(n_data: int = 1, n_spatial: int = 2,
                 data_axis: str = "data",
                 spatial_axis: str = "spatial") -> Mesh:
    """A 2-D (data, spatial) mesh over the first n_data*n_spatial devices.

    The spatial axis is the mesh's minor (fastest-varying) dimension so halo
    exchanges between row-adjacent shards land on physically adjacent chips
    (ICI nearest-neighbor links) under the default device enumeration.
    """
    from yolov5m_tpu.parallel.dp import make_mesh2d
    return make_mesh2d(n_data, n_spatial, data_axis, spatial_axis)


def make_sp_infer_fn(model, variables, anchors_norm, mesh: Mesh,
                     spatial_axis: str = "spatial",
                     data_axis: Optional[str] = "data",
                     strides: Tuple[int, ...] = (8, 16, 32),
                     conf_threshold: float = 0.25,
                     iou_threshold: float = 0.45,
                     max_detections: int = 300,
                     pre_nms_topk: int = 1024,
                     backend: str = "auto") -> Callable:
    """Build a jitted SP inference function `(images) -> (det, valid)`.

    model/variables: a fused (BN-folded) or plain YOLOv5 + its variables.
    images: (bs, H, W, 3); H is sharded over `spatial_axis` and (if
    `data_axis` names a mesh axis) bs over `data_axis`. Pass `data_axis=None`
    for a pure-SP 1-D mesh. A host array works directly — jit shards it on
    transfer; device-resident inputs should already carry the row sharding.

    Returns per-image (bs, max_detections, 6) [class, conf, x1 y1 x2 y2] and
    a (bs, max_detections) valid mask, batch-sharded (replicated over the
    spatial axis). Semantics identical to the single-device fused pipeline —
    parity-tested in tests/test_sp_infer.py.
    """
    from yolov5m_tpu.ops.postprocess import fused_detect

    from yolov5m_tpu.parallel.dp import resolve_data_axis
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(spatial_axis,))
    anchors_norm = jnp.asarray(anchors_norm)
    # params replicated: every chip runs every layer on its row slice
    variables = jax.device_put(variables, NamedSharding(mesh, P()))

    img_sharding = NamedSharding(mesh, P(data_axis, spatial_axis))
    out_sharding = NamedSharding(mesh, P(data_axis))

    @functools.partial(jax.jit, in_shardings=img_sharding,
                       out_shardings=(out_sharding, out_sharding))
    def sp_infer(images):
        preds = model.apply(variables, images, train=False)
        # leave the spatially-sharded regime before the global postprocess:
        # all-gather the (small) head logits back to batch-only sharding
        preds = [jax.lax.with_sharding_constraint(p, out_sharding)
                 for p in preds]
        return fused_detect(preds, anchors_norm, strides=strides,
                            conf_threshold=conf_threshold,
                            iou_threshold=iou_threshold,
                            max_detections=max_detections,
                            pre_nms_topk=pre_nms_topk, backend=backend)

    return sp_infer


def make_sp_train_step(model, loss_fn, optimizer, mesh: Mesh,
                       accumulate: int = 1,
                       spatial_axis: str = "spatial",
                       data_axis: Optional[str] = "data") -> Callable:
    """Spatially-partitioned TRAINING: jit the standard train step with the
    image rows sharded over `spatial_axis` (and the batch over `data_axis`
    when the mesh has one). GSPMD partitions the conv forward AND backward
    with the halo exchanges each window op's gradient needs, and inserts
    the cross-shard reductions for the loss, the gradients, and the
    BatchNorm batch statistics automatically — SPMD partitioning preserves
    program semantics exactly, so no pmean/psum plumbing appears here
    (contrast parallel/dp.py, which runs per-shard functions under
    shard_map and must reduce explicitly).

    Use when ONE image's activations exceed a chip (large-canvas training,
    e.g. 1280²+ aerial/document imagery — the training analog of
    make_sp_infer_fn) or when the global batch is smaller than the mesh.
    For batch >= mesh size, plain DP (parallel/dp.py) is faster: it needs
    no halo traffic. Parity vs the single-device step is pinned by
    tests/test_sp_train.py.

    Returns `step(state, image, labels, mask) -> (state, metrics)` with the
    TrainState replicated (donated) and labels/mask batch-sharded like the
    images' batch dim.
    """
    from yolov5m_tpu.train.trainer import make_train_step

    from yolov5m_tpu.parallel.dp import resolve_data_axis
    data_axis = resolve_data_axis(data_axis, mesh, reserved=(spatial_axis,))

    step = make_train_step(model, loss_fn, optimizer, accumulate)
    repl = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P(data_axis, spatial_axis))
    row_s = NamedSharding(mesh, P(data_axis))  # labels/mask: batch dim only

    return jax.jit(step,
                   in_shardings=(repl, img_s, row_s, row_s),
                   out_shardings=(repl, repl),
                   donate_argnums=0)
