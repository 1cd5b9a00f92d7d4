"""Fixed-shape, fully on-device batched NMS.

TPU-native replacement for the reference's postprocess, which hops to a C++
torchvision kernel per image (reference utils/bboxes_utils.py:175-209,
torchvision.ops.nms at :195). Here the whole pipeline — confidence gating,
xywh→xyxy, greedy class-aware suppression, top-300 cap — is one jitted XLA
graph with static shapes, vmapped over the batch, so boxes never leave the
device and there is exactly one compilation per (N, K) configuration.

Two deliberate fixes vs the reference (see SURVEY.md §2 quirks):
  * class separation uses an exact same-class mask instead of offsetting
    coordinates by the raw class id (reference bboxes_utils.py:195 shifts
    boxes by at most `nc` pixels, which does NOT separate classes for boxes
    larger than the class gap);
  * results are per-image fixed-size tensors + validity mask instead of a
    whole-batch concatenation (the reference's torch.cat at :209 mixes boxes
    across images in downstream mAP).

Output rows are (class, conf, x1, y1, x2, y2), like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy

NEG_INF = -1e10


def _greedy_suppress(suppress_matrix: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates.

    Args:
      suppress_matrix: (K, K) bool, True where row i suppresses column j
        (iou > threshold and same class). Rows/cols are score-descending.
      valid: (K,) bool, candidate passes the confidence threshold.
    Returns:
      (K,) bool keep mask.
    """
    k = suppress_matrix.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    def body(i, alive):
        keeper = alive[i] & valid[i]
        row = suppress_matrix[i] & (col_ids > i)
        return jnp.where(keeper, alive & ~row, alive)

    alive = jax.lax.fori_loop(0, k, body, valid)
    return alive


def nms_single(
    rows: jnp.ndarray,
    iou_threshold: float,
    conf_threshold: float,
    max_detections: int = 300,
    pre_nms_topk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NMS for one image.

    Args:
      rows: (N, 6) decoded rows (class, conf, cx, cy, w, h) in pixels.
      iou_threshold: suppress same-class boxes with IoU > threshold
        (torchvision semantics: keep IoU <= threshold).
      conf_threshold: reference keeps conf strictly greater (bboxes_utils.py:186).
      max_detections: output capacity (reference caps at 300, :202).
      pre_nms_topk: K candidates entering the quadratic suppression stage.
    Returns:
      out: (max_detections, 6) rows (class, conf, x1, y1, x2, y2), zero-padded.
      valid: (max_detections,) bool mask of real detections.
    """
    n = rows.shape[0]
    k = min(pre_nms_topk, n)

    cls = rows[:, 0]
    conf = rows[:, 1]
    passes = conf > conf_threshold

    # Top-K by confidence (masked). Scores are already in [0,1].
    gated = jnp.where(passes, conf, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(gated, k)
    cand = rows[top_idx]
    cand_valid = top_scores > NEG_INF / 2

    # xywh → xyxy (reference bboxes_utils.py:190-193).
    cx, cy, w, h = cand[:, 2], cand[:, 3], cand[:, 4], cand[:, 5]
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    ccls = cand[:, 0]

    iou = pairwise_iou_xyxy(boxes, boxes)
    same_class = ccls[:, None] == ccls[None, :]
    suppress = (iou > iou_threshold) & same_class

    keep = _greedy_suppress(suppress, cand_valid)

    # Compact kept rows (already score-sorted) into the first `max_detections`
    # slots with a scatter on cumulative rank — fixed shape, no host sync.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1            # rank among kept
    slot = jnp.where(keep & (rank < max_detections), rank, max_detections)
    out_rows = jnp.concatenate(
        [ccls[:, None], cand[:, 1:2], boxes], axis=-1)       # (K, 6)
    out = jnp.zeros((max_detections + 1, 6), out_rows.dtype).at[slot].set(out_rows)
    valid = jnp.zeros((max_detections + 1,), jnp.bool_).at[slot].set(keep)
    return out[:max_detections], valid[:max_detections]


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "conf_threshold", "max_detections", "pre_nms_topk")
)
def batched_nms(
    rows: jnp.ndarray,
    iou_threshold: float,
    conf_threshold: float,
    max_detections: int = 300,
    pre_nms_topk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NMS: vmap of nms_single over the leading batch dimension.

    Replaces the reference's per-image Python loop over torchvision.ops.nms
    (bboxes_utils.py:184-209) with one fixed-shape XLA computation.

    Args:
      rows: (bs, N, 6) decoded rows (class, conf, cx, cy, w, h).
    Returns:
      out: (bs, max_detections, 6) rows (class, conf, x1, y1, x2, y2).
      valid: (bs, max_detections) bool.
    """
    fn = functools.partial(
        nms_single,
        iou_threshold=iou_threshold,
        conf_threshold=conf_threshold,
        max_detections=max_detections,
        pre_nms_topk=pre_nms_topk,
    )
    return jax.vmap(fn)(rows)
