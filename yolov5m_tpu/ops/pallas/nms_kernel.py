"""Pallas TPU kernel for greedy NMS suppression.

The native-equivalent of the C++/CUDA kernel the reference reaches through
torchvision.ops.nms (reference utils/bboxes_utils.py:3,195). The greedy scan
is inherently sequential in the keep decision, but each step's suppression
test is a K-wide vector op — a perfect VPU shape. This kernel keeps all K
candidates resident in VMEM in lane-major (row, K) layout and materializes
no K×K IoU matrix (the XLA fallback in ops/nms.py builds one): O(K) memory,
O(K²) VPU flops, zero HBM traffic inside the loop.

Layout per image (lane dimension = candidates, K multiple of 128):
  data (8, K) f32: rows = x1, y1, x2, y2, class, valid, 0, 0
  out  (1, K) f32: 1.0 = keep

Grid = batch; one program per image.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard for safety
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic compile path)."""
    try:
        return _HAS_PLTPU and jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def _nms_kernel(iou_threshold: float, data_ref, keep_ref):
    # data_ref: (1, 8, K); keep_ref: (1, 1, K)
    k = data_ref.shape[2]
    x1 = data_ref[0, 0:1, :]       # (1, K)
    y1 = data_ref[0, 1:2, :]
    x2 = data_ref[0, 2:3, :]
    y2 = data_ref[0, 3:4, :]
    cls = data_ref[0, 4:5, :]
    valid = data_ref[0, 5:6, :]
    area = (x2 - x1) * (y2 - y1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, alive):
        # candidate i's box extracted by masked reduction (Mosaic has no
        # dynamic_slice on values; a lane-onehot multiply-reduce is one VPU
        # pass per scalar and keeps everything in registers)
        onehot = (lane == i).astype(jnp.float32)                # (1, K)
        bx1 = jnp.sum(x1 * onehot)
        by1 = jnp.sum(y1 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        by2 = jnp.sum(y2 * onehot)
        bcls = jnp.sum(cls * onehot)
        barea = (bx2 - bx1) * (by2 - by1)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (area + barea - inter + 1e-7)

        suppress = (iou > iou_threshold) & (cls == bcls) & (lane > i)
        alive_i = jnp.sum(alive * onehot) > 0.0
        return jnp.where(alive_i, alive * (1.0 - suppress.astype(alive.dtype)),
                         alive)

    # valid candidates are a score-sorted prefix — stop the scan there
    n_valid = jnp.sum(valid).astype(jnp.int32)
    alive = jax.lax.fori_loop(0, n_valid, body, valid)
    keep_ref[0, 0:1, :] = alive


def greedy_suppress_pallas(boxes_xyxy: jnp.ndarray, classes: jnp.ndarray,
                           valid: jnp.ndarray, iou_threshold: float,
                           interpret: bool = False) -> jnp.ndarray:
    """Greedy NMS keep-mask for score-sorted candidates.

    Args:
      boxes_xyxy: (bs, K, 4) float32, sorted by descending score.
      classes: (bs, K) float32 class ids.
      valid: (bs, K) bool.
    Returns:
      (bs, K) bool keep mask. Semantics identical to ops.nms._greedy_suppress.
    """
    bs, k, _ = boxes_xyxy.shape
    assert k % 128 == 0, f"K must be a multiple of 128 (lanes), got {k}"

    data = jnp.concatenate([
        boxes_xyxy.transpose(0, 2, 1),                    # (bs, 4, K)
        classes[:, None, :],
        valid[:, None, :].astype(jnp.float32),
        jnp.zeros((bs, 2, k), jnp.float32),
    ], axis=1).astype(jnp.float32)                        # (bs, 8, K)

    in_specs = [pl.BlockSpec((1, 8, k), lambda b: (b, 0, 0))]
    out_specs = pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0))
    if _HAS_PLTPU and not interpret:
        in_specs = [pl.BlockSpec((1, 8, k), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
        out_specs = pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold),
        out_shape=jax.ShapeDtypeStruct((bs, 1, k), jnp.float32),
        grid=(bs,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(data)
    return keep[:, 0, :] > 0.0
