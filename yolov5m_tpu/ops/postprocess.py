"""Fused detection postprocess: gate → gather → decode → NMS.

The straightforward pipeline (ops/decode.py → ops/nms.py) decodes ALL
anchors×cells (sigmoid over every class channel, ~2.1M rows × 85 at 640²)
before the confidence gate throws 95%+ of them away. This fused path flips
the order, exploiting two monotonicities:

  * sigmoid is monotone → top-k by objectness LOGIT == top-k by confidence;
  * argmax over class logits == argmax over class sigmoids.

So: top-K candidates are selected from the raw objectness logits per image,
only K rows are gathered (in compute dtype), and the xy/wh/class decode +
sigmoid runs on (bs, K, 5+nc) instead of (bs, N, 5+nc). Grid positions,
anchors and strides for the gather come from precomputed per-row constant
tables baked into the jit.

Semantics match decode_predictions + batched_nms exactly (same reference
math: plot_utils.py:23-27 decode, bboxes_utils.py:175-209 NMS).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.ops.nms import (
    NEG_INF, _compact, _greedy_suppress, _greedy_suppress_fixpoint,
    _suppress_matrix, resolve_backend)
from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy


def _row_tables(grid_sizes: Sequence[Tuple[int, int]], anchors_norm,
                strides: Sequence[int]):
    """Per-row (flat index) decode tables: grid xy, anchor wh (px), stride.
    Layout matches decode_layer's reshape (anchor-major, then y, x). Built
    with jnp so anchors may be a traced array; grid parts are XLA constants."""
    na = anchors_norm.shape[1]
    gxy, awh, std = [], [], []
    for s, (ny, nx) in enumerate(grid_sizes):
        ys = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        g = jnp.stack([xs, ys], -1).reshape(1, ny * nx, 2)
        gxy.append(jnp.broadcast_to(g, (na, ny * nx, 2)).reshape(-1, 2))
        a = (anchors_norm[s].astype(jnp.float32) * strides[s])[:, None, :]
        awh.append(jnp.broadcast_to(a, (na, ny * nx, 2)).reshape(-1, 2))
        std.append(jnp.full((na * ny * nx,), strides[s], jnp.float32))
    return jnp.concatenate(gxy), jnp.concatenate(awh), jnp.concatenate(std)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "conf_threshold", "iou_threshold",
                     "max_detections", "pre_nms_topk", "backend"))
def fused_detect(
    preds,
    anchors_norm,
    strides: Tuple[int, ...] = (8, 16, 32),
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_detections: int = 300,
    pre_nms_topk: int = 1024,
    backend: str = "auto",
):
    """preds: list of (bs, na, ny, nx, 5+nc) raw logits (any float dtype).

    Returns (out (bs, max_det, 6) [class, conf, x1, y1, x2, y2], valid).
    """
    grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
    gxy, awh, std = _row_tables(grid_sizes, anchors_norm, strides)

    bs = preds[0].shape[0]
    no = preds[0].shape[-1]
    flat = jnp.concatenate(
        [p.reshape(bs, -1, no) for p in preds], axis=1)      # (bs, N, 5+nc)
    obj_logit = flat[..., 4].astype(jnp.float32)             # (bs, N)

    n = flat.shape[1]
    k = min(pre_nms_topk, n)
    backend = resolve_backend(backend, k)
    # gate on logits: sigmoid is monotone
    logit_thresh = float(np.log(conf_threshold / (1.0 - conf_threshold)))
    gated = jnp.where(obj_logit > logit_thresh, obj_logit, NEG_INF)
    top_logits, top_idx = jax.lax.top_k(gated, k)            # (bs, K)
    valid = top_logits > NEG_INF / 2

    rows = jnp.take_along_axis(flat, top_idx[..., None], axis=1)  # (bs, K, no)
    rows = rows.astype(jnp.float32)
    g = gxy[top_idx]                                          # (bs, K, 2)
    a = awh[top_idx]
    s = std[top_idx][..., None]

    xy = (2.0 * jax.nn.sigmoid(rows[..., 0:2]) + g - 0.5) * s
    wh = (2.0 * jax.nn.sigmoid(rows[..., 2:4])) ** 2 * a
    conf = jax.nn.sigmoid(top_logits)
    cls = jnp.argmax(rows[..., 5:], axis=-1).astype(jnp.float32)
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)  # (bs, K, 4)

    if backend == "pallas":
        from yolov5m_tpu.ops.pallas import greedy_suppress_pallas
        keep = greedy_suppress_pallas(boxes, cls, valid, iou_threshold)
    elif backend == "xla_loop":
        def suppress_one(b, c, v):
            iou = pairwise_iou_xyxy(b, b)
            mat = (iou > iou_threshold) & (c[:, None] == c[None, :])
            return _greedy_suppress(mat, v)

        keep = jax.vmap(suppress_one)(boxes, cls, valid)
    else:
        keep = _greedy_suppress_fixpoint(
            _suppress_matrix(boxes, cls, iou_threshold), valid)

    return jax.vmap(functools.partial(_compact, max_detections=max_detections))(
        boxes, cls, conf, keep)
