"""Box geometry ops — pure jnp, fixed-shape, jit/vmap friendly.

Semantics match the reference's geometry library (reference
utils/bboxes_utils.py and utils/utils.py:151-181) but are array-native: no
Python loops, no in-place mutation (the reference's `iou_width_height`
mutates its anchors argument in place, bboxes_utils.py:18 — we don't).

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_wh(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU computed from widths/heights only (boxes assumed co-centered).

    Used for anchor matching. Equivalent to the math of reference
    utils/bboxes_utils.py:22-29 (without the in-place anchor rescale at :18-20;
    callers pass anchors already in the desired unit).

    Args:
      wh1: (..., 2) widths/heights.
      wh2: (..., 2) widths/heights (broadcastable against wh1).
    Returns:
      (...,) IoU.
    """
    inter = jnp.minimum(wh1[..., 0], wh2[..., 0]) * jnp.minimum(wh1[..., 1], wh2[..., 1])
    union = wh1[..., 0] * wh1[..., 1] + wh2[..., 0] * wh2[..., 1] - inter
    return inter / union


def box_iou(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    box_format: str = "midpoint",
    giou: bool = False,
    diou: bool = False,
    ciou: bool = False,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """IoU variants between paired boxes. GIoU math matches reference
    bboxes_utils.py:33-87; DIoU/CIoU (Zheng et al. 2020) are additional
    regression objectives the reference lacks (the Ultralytics lineage
    trains with CIoU).

    Args:
      boxes1, boxes2: (..., 4), midpoint (cx,cy,w,h) or corners (x1,y1,x2,y2).
      giou/diou/ciou: pick at most one variant; all False → plain IoU.
    Returns:
      (..., 1) IoU, keeping the trailing singleton like the reference.
    """
    if box_format == "midpoint":
        b1_x1 = boxes1[..., 0:1] - boxes1[..., 2:3] / 2
        b1_y1 = boxes1[..., 1:2] - boxes1[..., 3:4] / 2
        b1_x2 = boxes1[..., 0:1] + boxes1[..., 2:3] / 2
        b1_y2 = boxes1[..., 1:2] + boxes1[..., 3:4] / 2
        b2_x1 = boxes2[..., 0:1] - boxes2[..., 2:3] / 2
        b2_y1 = boxes2[..., 1:2] - boxes2[..., 3:4] / 2
        b2_x2 = boxes2[..., 0:1] + boxes2[..., 2:3] / 2
        b2_y2 = boxes2[..., 1:2] + boxes2[..., 3:4] / 2
    else:  # corners
        b1_x1, b1_y1, b1_x2, b1_y2 = (boxes1[..., i:i + 1] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (boxes2[..., i:i + 1] for i in range(4))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1

    inter_w = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = inter_w * inter_h

    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if giou or diou or ciou:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if giou:
            c_area = cw * ch + eps
            return iou - (c_area - union) / c_area
        # DIoU/CIoU: center-distance penalty over the enclosing diagonal
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b1_x1 + b1_x2 - b2_x1 - b2_x2) ** 2
                + (b1_y1 + b1_y2 - b2_y1 - b2_y2) ** 2) / 4.0
        if diou:
            return iou - rho2 / c2
        # CIoU: + aspect-ratio consistency term
        import math
        v = (4 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps))
                                  - jnp.arctan(w1 / (h1 + eps))) ** 2
        alpha = v / (v - iou + (1 + eps))
        alpha = jax.lax.stop_gradient(alpha)
        return iou - (rho2 / c2 + v * alpha)
    return iou


def pairwise_iou_xyxy(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """All-pairs IoU between two corner-format box sets.

    Args:
      boxes1: (N, 4) xyxy.
      boxes2: (M, 4) xyxy.
    Returns:
      (N, M) IoU matrix. Used by NMS and mAP matching.
    """
    a = boxes1[:, None, :]  # (N,1,4)
    b = boxes2[None, :, :]  # (1,M,4)
    inter_w = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0)
    inter_h = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0)
    inter = inter_w * inter_h
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    union = area1[:, None] + area2[None, :] - inter + eps
    return inter / union


def coco_to_yolo(boxes: jnp.ndarray, w0: float = 640.0, h0: float = 640.0) -> jnp.ndarray:
    """COCO (x1,y1,w,h absolute) → YOLO (cx,cy,w,h normalized).

    Math matches reference bboxes_utils.py:95-98.
    """
    x1, y1, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack(
        [(2 * x1 + w) / (2 * w0), (2 * y1 + h) / (2 * h0), w / w0, h / h0], axis=-1
    )


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """Midpoint (cx,cy,w,h) → corners (x1,y1,x2,y2), same units."""
    cx, cy, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners (x1,y1,x2,y2) → midpoint (cx,cy,w,h), same units."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn_to_xyxy(boxes: jnp.ndarray, w: float = 640, h: float = 640,
                  padw: float = 0, padh: float = 0) -> jnp.ndarray:
    """Normalized midpoint → absolute corners. Matches reference utils/utils.py:151-158."""
    cx, cy, bw, bh = (boxes[..., i] for i in range(4))
    return jnp.stack([
        w * (cx - bw / 2) + padw,
        h * (cy - bh / 2) + padh,
        w * (cx + bw / 2) + padw,
        h * (cy + bh / 2) + padh,
    ], axis=-1)


def xywhn_to_xyxy_np(boxes, w: float = 640, h: float = 640):
    """Pure-numpy xywhn_to_xyxy for HOST paths (eval loop, plotting): a
    per-image device dispatch of this tiny op would serialize the loop on
    remote/tunneled backends. Same math as xywhn_to_xyxy."""
    import numpy as np
    cx, cy, bw, bh = (boxes[..., i] for i in range(4))
    return np.stack([w * (cx - bw / 2), h * (cy - bh / 2),
                     w * (cx + bw / 2), h * (cy + bh / 2)], axis=-1)


def xyxy_to_xywhn(boxes: jnp.ndarray, w: float = 640, h: float = 640) -> jnp.ndarray:
    """Absolute corners → normalized midpoint. Matches reference utils/utils.py:161-170."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([
        ((x1 + x2) / 2) / w,
        ((y1 + y2) / 2) / h,
        (x2 - x1) / w,
        (y2 - y1) / h,
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, shape_hw) -> jnp.ndarray:
    """Clip xyxy boxes to image bounds (h, w). Matches reference utils/utils.py:172-181."""
    h, w = shape_hw
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w),
        jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w),
        jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)


def rescale_boxes(boxes: jnp.ndarray, starting_size, ending_size) -> jnp.ndarray:
    """Rescale boxes between image sizes, truncating to 2 decimals like the
    reference (bboxes_utils.py:116-126, np.floor(x*100)/100)."""
    sw, sh = starting_size
    ew, eh = ending_size
    scale = jnp.asarray([ew / sw, eh / sh, ew / sw, eh / sh], dtype=boxes.dtype)
    return jnp.floor(boxes[..., :4] * scale * 100) / 100


def unletterbox_boxes(boxes, ratio, dwdh, orig_hw):
    """Map xyxy boxes from letterbox space back onto the original image.

    Inverse of data.native.letterbox's geometry (resize by `ratio`, pad by
    (dw, dh)); the reference's analog is rescale_bboxes
    (reference utils/bboxes_utils.py:116-126), which only handles the plain
    resize — this also removes the letterbox padding and clips to the
    original image bounds. Works on numpy or jnp arrays (..., >=4) with the
    box in the first 4 columns.
    """
    rw, rh = (ratio, ratio) if not hasattr(ratio, "__len__") else ratio
    dw, dh = dwdh
    h0, w0 = orig_hw
    x1 = jnp.clip((boxes[..., 0] - dw) / rw, 0, w0)
    y1 = jnp.clip((boxes[..., 1] - dh) / rh, 0, h0)
    x2 = jnp.clip((boxes[..., 2] - dw) / rw, 0, w0)
    y2 = jnp.clip((boxes[..., 3] - dh) / rh, 0, h0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def unletterbox_boxes_np(boxes, ratio, dwdh, orig_hw):
    """Host-side numpy twin of unletterbox_boxes (same convention as
    xywhn_to_xyxy_np above): per-request response paths must not pay
    per-box device dispatches — over a remote device link each tiny jnp op
    is a full round-trip (serving/server.py answers every request with
    one of these)."""
    import numpy as np
    rw, rh = (ratio, ratio) if not hasattr(ratio, "__len__") else ratio
    dw, dh = dwdh
    h0, w0 = orig_hw
    b = np.asarray(boxes, np.float32)
    x1 = np.clip((b[..., 0] - dw) / rw, 0, w0)
    y1 = np.clip((b[..., 1] - dh) / rh, 0, h0)
    x2 = np.clip((b[..., 2] - dw) / rw, 0, w0)
    y2 = np.clip((b[..., 3] - dh) / rh, 0, h0)
    return np.stack([x1, y1, x2, y2], axis=-1)
