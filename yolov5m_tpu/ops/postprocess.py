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
math: plot_utils.py:23-27 decode, bboxes_utils.py:175-209 NMS) — up to one
documented tie-break: candidates here are ordered by objectness LOGIT,
while the unfused path orders by sigmoid(conf). Sigmoid is monotone but
not injective in f32 (logits above ~16.7 all round to conf==1.0), so when
several candidates SATURATE to the same f32 confidence, the unfused sort
falls back to index order while this path still ranks them by their true
logits — strictly more information, but greedy NMS may then keep a
different member of a saturated overlapping cluster. Below saturation the
two pipelines are bit-identical (pinned by tests/test_postprocess.py).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.ops.decode import make_grid
from yolov5m_tpu.ops.nms import (
    NEG_INF, _compact, resolve_backend, suppress)


def _row_tables(grid_sizes: Sequence[Tuple[int, int]], anchors_norm,
                strides: Sequence[int]):
    """Per-row (flat index) decode tables: grid xy, anchor wh (px), stride.
    Layout matches decode_layer's reshape (anchor-major, then y, x). Built
    with jnp so anchors may be a traced array; grid parts are XLA constants."""
    na = anchors_norm.shape[1]
    gxy, awh, std = [], [], []
    for s, (ny, nx) in enumerate(grid_sizes):
        g = make_grid(ny, nx).reshape(1, ny * nx, 2)
        gxy.append(jnp.broadcast_to(g, (na, ny * nx, 2)).reshape(-1, 2))
        a = (anchors_norm[s].astype(jnp.float32) * strides[s])[:, None, :]
        awh.append(jnp.broadcast_to(a, (na, ny * nx, 2)).reshape(-1, 2))
        std.append(jnp.full((na * ny * nx,), strides[s], jnp.float32))
    return jnp.concatenate(gxy), jnp.concatenate(awh), jnp.concatenate(std)


def _gate_topk_sort(gated, k):
    """Exact top-k by full sort (lax.top_k). O(N log^2 N) bitonic passes —
    ~6 ms/batch at bs=128/N=25200 on v5e, the right tool when many rows
    pass the gate (eval at conf 0.01)."""
    top_logits, top_idx = jax.lax.top_k(gated, k)
    return top_logits, top_idx, top_logits > NEG_INF / 2


def _gate_compact(gated, k):
    """Exact gate by cumsum + binary-search compaction: selects every row
    above the gate (already NEG_INF-masked) in O(N) + K·log N gathers
    instead of sorting all N scores, then score-sorts only the K selected
    (log^2 K passes over K rows).

    Returns the SAME (top_logits, top_idx, valid) as _gate_topk_sort
    whenever at most k rows pass the gate — the serving regime by
    construction (Config.topk_for_conf sizes k to the conf gate; the
    lossless-below-capacity property is what tests/test_postprocess.py
    pins). When more than k rows pass, the k LOWEST-INDEX survivors are
    kept (index-truncation) rather than the k highest-scoring — acceptable
    only behind a high conf gate.

    MEASURED OFF on chip (2026-08-17, benchmarks/profile_gate.py, bs=128,
    conf 0.25, K=512, interleaved arms): compact 81.9 ms/batch vs sort
    72.7 — 0.888x. The vmapped searchsorted + gather costs more than the
    single fused top_k over 25200 rows. gate="auto" therefore routes to
    the sort path everywhere; compact stays as a tested option in case a
    future libtpu shifts the balance.
    """
    n = gated.shape[-1]
    k = min(k, n)
    mask = gated > NEG_INF / 2
    # exact integer prefix-sum; cumsum[i] = #survivors in [0, i]
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)

    def per_row(csum_row, gated_row):
        # index of the j-th survivor = first i with csum[i] == j+1
        idx = jnp.searchsorted(csum_row, jnp.arange(1, k + 1, dtype=jnp.int32),
                               side="left")
        in_range = idx < n
        idx = jnp.where(in_range, idx, n - 1)
        logits = jnp.where(in_range, gated_row[idx], NEG_INF)
        return logits, idx.astype(jnp.int32)

    logits, idx = jax.vmap(per_row)(csum, gated)
    # NMS consumes candidates in descending-score order (top_k contract):
    # sort just the K selected rows. lax.top_k is stable, so equal scores
    # keep index order — bitwise-identical to the sort path below capacity.
    top_logits, perm = jax.lax.top_k(logits, k)
    top_idx = jnp.take_along_axis(idx, perm, axis=-1)
    return top_logits, top_idx, top_logits > NEG_INF / 2


@functools.partial(
    jax.jit,
    static_argnames=("strides", "conf_threshold", "iou_threshold",
                     "max_detections", "pre_nms_topk", "backend", "gate",
                     "interpret"))
def fused_detect(
    preds,
    anchors_norm,
    strides: Tuple[int, ...] = (8, 16, 32),
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_detections: int = 300,
    pre_nms_topk: int = 1024,
    backend: str = "auto",
    gate: str = "auto",
    interpret: bool = False,
):
    """preds: list of (bs, na, ny, nx, 5+nc) raw logits (any float dtype).

    gate: how top-K candidates are selected from the gated objectness
    logits — "sort" (exact lax.top_k over all N rows; also what "auto"
    resolves to: measured 1.13x faster e2e than compact at the serving
    shape) or "compact" (cumsum+searchsorted compaction; exact below
    capacity, index-truncating above; kept as a tested option).

    Returns (out (bs, max_det, 6) [class, conf, x1, y1, x2, y2], valid).
    """
    grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
    gxy, awh, std = _row_tables(grid_sizes, anchors_norm, strides)

    bs = preds[0].shape[0]
    no = preds[0].shape[-1]
    flat = jnp.concatenate(
        [p.reshape(bs, -1, no) for p in preds], axis=1)      # (bs, N, 5+nc)
    # f32 gate. A bf16 gate (sort in the input dtype — halves the top_k's
    # HBM traffic, exact by monotone-cast) was A/B'd on chip 2026-08-17:
    # 75.6 vs 72.9 ms/batch e2e at bs=128 — 0.964x, top_k is FASTER on f32
    # on this TPU. Identical detections either way (the head already
    # rounded to bf16; tests/test_postprocess.py pins the invariance).
    obj_logit = flat[..., 4].astype(jnp.float32)             # (bs, N)

    n = flat.shape[1]
    k = min(pre_nms_topk, n)
    backend = resolve_backend(backend, k)
    # gate on logits: sigmoid is monotone
    logit_thresh = float(np.log(conf_threshold / (1.0 - conf_threshold)))
    gated = jnp.where(obj_logit > logit_thresh, obj_logit, NEG_INF)
    # "auto" = sort: the compact gate measured 0.888x of sort e2e on chip
    # (see _gate_compact docstring), so the full top_k is the default in
    # every regime. Unknown strings are rejected — a silently-defaulted
    # typo would corrupt an A/B measurement.
    if gate not in ("auto", "sort", "compact"):
        raise ValueError(f"gate must be auto|sort|compact, got {gate!r}")
    gate_fn = _gate_compact if gate == "compact" else _gate_topk_sort
    top_logits, top_idx, valid = gate_fn(gated, k)           # (bs, K)

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

    keep = suppress(boxes, cls, valid, iou_threshold, backend=backend,
                    interpret=interpret)

    return jax.vmap(functools.partial(_compact, max_detections=max_detections))(
        boxes, cls, conf, keep)


def gate_density(preds, anchors_norm, conf_threshold: float = 0.25,
                 iou_threshold: float = 0.45, max_detections: int = 300,
                 pre_nms_topk: int = 1024, backend: str = "auto",
                 strides: Tuple[int, ...] = (8, 16, 32)):
    """Per-image postprocess WORKLOAD statistics: (gate survivors,
    final detections), each (bs,).

    "Gate survivors" counts grid cells whose objectness logit clears the
    serving confidence gate sigma(obj) > conf — i.e. how many candidates
    the top-k/NMS stages actually process per image. This is the single
    definition used by bench.py's detection_density record and the
    trained-weights provenance sidecar (benchmarks/train_flagship_synth.py)
    so the two can never drift apart.
    """
    thresh_logit = float(np.log(conf_threshold / (1.0 - conf_threshold)))
    obj = jnp.concatenate(
        [p[..., 4].reshape(p.shape[0], -1) for p in preds], axis=1)
    survivors = (obj.astype(jnp.float32) > thresh_logit).sum(axis=1)
    _, valid = fused_detect(preds, anchors_norm, strides=strides,
                            conf_threshold=conf_threshold,
                            iou_threshold=iou_threshold,
                            max_detections=max_detections,
                            pre_nms_topk=pre_nms_topk, backend=backend)
    return survivors, valid.sum(axis=1)
