"""On-device image preprocessing: letterbox + normalize inside the jit.

The reference letterboxes on the host with cv2 (reference utils/utils.py:
119-149, cv2.resize + copyMakeBorder); this module is the TPU-native serving
path — raw uint8 camera frames go to the device once and everything after
(resize, pad, normalize, model, decode, NMS) is one XLA graph, so the
host↔device boundary carries H*W*3 bytes instead of float32 tensors and the
host never touches pixels.

Geometry is identical to data.native.letterbox (ratio, (dw, dh) contract):
shapes are static under jit, so the scale factor and padding are Python
constants folded into the compiled graph — no dynamic shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def letterbox_geometry(src_hw: Tuple[int, int], dst_hw: Tuple[int, int],
                       scaleup: bool = True):
    """Static letterbox geometry: (ratio, (dw, dh), (top, left), (uh, uw)).
    Matches data.native.letterbox's host math exactly."""
    sh, sw = src_hw
    nh, nw = dst_hw
    r = min(nh / sh, nw / sw)
    if not scaleup:
        r = min(r, 1.0)
    uw, uh = int(round(sw * r)), int(round(sh * r))
    dw, dh = (nw - uw) / 2, (nh - uh) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return r, (dw, dh), (top, left), (uh, uw)


def normalize_uint8(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] → `dtype` [0,1], converting BEFORE dividing, in the
    target dtype — the single ingress-normalize definition shared by the
    serving runtime (serving/server.py), the TP serving path, and bench.py.

    uint8 ingress halves/quarters the host→device bytes vs f32; doing the
    divide in the COMPUTE dtype (bf16 for serving) also halves the on-device
    convert-fusion traffic (measured +2.2% e2e, ROUND4_NOTES §7). Numerics:
    every uint8 code is exact in bf16 (8 mantissa bits ≥ 8-bit integers),
    and bf16(u)/bf16(255) == bf16(f32(u)/255) for ALL 256 codes (exhaustive
    test, tests/test_preprocess_device.py) — so the fast bf16 path is
    bit-identical to host-side f32 division followed by the model's own
    input cast, and serving results do not depend on which side normalizes.
    """
    return x.astype(dtype) / jnp.asarray(255.0, dtype)


def _bilinear_axis_tables(src: int, dst: int):
    """Half-pixel-center bilinear gather indices + weights (static numpy).
    INTER_LINEAR semantics, NO antialiasing — matches the host path
    (data/native.py resize_bilinear / cv2); jax.image.resize antialiases on
    downscale, which would domain-shift serving away from how the model was
    trained/evaluated."""
    import numpy as np
    f = np.clip((np.arange(dst) + 0.5) * src / dst - 0.5, 0, src - 1)
    i0 = f.astype(np.int32)
    i1 = np.minimum(i0 + 1, src - 1).astype(np.int32)
    t = (f - i0).astype(np.float32)
    return i0, i1, t


@functools.partial(jax.jit, static_argnames=("out_hw", "fill", "scaleup"))
def letterbox_normalize(images: jnp.ndarray,
                        out_hw: Tuple[int, int] = (640, 640),
                        fill: int = 114,
                        scaleup: bool = True) -> jnp.ndarray:
    """(bs, H, W, 3) uint8/float [0,255] → (bs, out_h, out_w, 3) float32 [0,1].

    Bilinear resize with half-pixel centers (cv2 INTER_LINEAR semantics, no
    antialiasing — identical math to the host path) to the aspect-preserving
    size, then constant-pad with the fill color and scale to [0,1]. Use
    letterbox_geometry for the (ratio, dw, dh) needed to map detections back
    (ops.boxes.unletterbox_boxes). Gather indices and weights are static XLA
    constants — no dynamic shapes.
    """
    bs, sh, sw, c = images.shape
    nh, nw = out_hw
    _, _, (top, left), (uh, uw) = letterbox_geometry((sh, sw), (nh, nw),
                                                     scaleup)
    x = images.astype(jnp.float32)
    if (uh, uw) != (sh, sw):
        y0, y1, ty = _bilinear_axis_tables(sh, uh)
        x0, x1, tx = _bilinear_axis_tables(sw, uw)
        ty = jnp.asarray(ty)[None, :, None, None]
        tx = jnp.asarray(tx)[None, None, :, None]
        rows0, rows1 = x[:, y0], x[:, y1]                    # (bs, uh, sw, c)
        top_ = rows0[:, :, x0] * (1 - tx) + rows0[:, :, x1] * tx
        bot_ = rows1[:, :, x0] * (1 - tx) + rows1[:, :, x1] * tx
        x = top_ * (1 - ty) + bot_ * ty
        # match the u8 host pipeline's rounding of resized pixels
        x = jnp.floor(jnp.clip(x, 0.0, 255.0) + 0.5)
    pad = ((0, 0), (top, nh - uh - top), (left, nw - uw - left), (0, 0))
    x = jnp.pad(x, pad, constant_values=float(fill))
    return x / 255.0


def make_serving_fn(model, variables, anchors_norm, src_hw: Tuple[int, int],
                    image_size: int = 640, conf: float = 0.25,
                    iou: float = 0.45, max_detections: int = 300,
                    pre_nms_topk: int = 1024):
    """End-to-end jitted serving function: raw uint8 frames → detections in
    ORIGINAL-image coordinates.

    Returns fn(images_u8 (bs, src_h, src_w, 3)) -> (det (bs, max_det, 6),
    valid (bs, max_det)) with det rows (class, conf, x1, y1, x2, y2) already
    unletterboxed to the source frame. One XLA graph, zero host pixels.
    """
    from yolov5m_tpu.ops.boxes import unletterbox_boxes
    from yolov5m_tpu.ops.postprocess import fused_detect

    ratio, (dw, dh), _, _ = letterbox_geometry(src_hw,
                                               (image_size, image_size))

    @jax.jit
    def serve(images_u8):
        x = letterbox_normalize(images_u8, (image_size, image_size))
        preds = model.apply(variables, x, train=False)
        det, valid = fused_detect(preds, anchors_norm, conf_threshold=conf,
                                  iou_threshold=iou,
                                  max_detections=max_detections,
                                  pre_nms_topk=pre_nms_topk)
        boxes = unletterbox_boxes(det[..., 2:6], ratio, (dw, dh), src_hw)
        return jnp.concatenate([det[..., :2], boxes], axis=-1), valid

    return serve
