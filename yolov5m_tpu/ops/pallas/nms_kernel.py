"""Pallas TPU kernel for greedy NMS suppression.

The native-equivalent of the C++/CUDA kernel the reference reaches through
torchvision.ops.nms (reference utils/bboxes_utils.py:3,195). Two phases, all
VMEM-resident:

  1. Build the upper-triangular suppress matrix S (K×K, bf16 0/1) in row
     blocks of 256 — S[i,j] = 1 if candidate i suppresses j (IoU > threshold,
     same class, j > i). Blocking bounds the f32 IoU temporaries to
     (256, K) so K=2048 fits VMEM (S itself is 8 MB bf16 at 2048).
  2. Greedy resolution by FIXPOINT iteration (same algorithm as the XLA
     backend's _greedy_suppress_fixpoint, see ops/nms.py for the proof):
        a_{t+1}[j] = valid[j] & not OR_{i<j} (a_t[i] & S[i,j])
     Each step is ONE (1,K)x(K,K) MXU dot against the VMEM-resident S —
     no HBM traffic per iteration (the XLA backend re-streams S from HBM
     every step) — and the loop runs a true convergence check, so results
     are bit-identical to the sequential greedy scan. Typical convergence:
     suppression-chain depth (<~6 after score sorting).

Layouts per image (lane dimension = candidates, K multiple of 128):
  data   (8, K) f32 rows: x1, y1, x2, y2, class, valid, 0, 0
  data_t (K, 8) f32 — same, transposed (built by XLA; Mosaic-side transposes
         of lane→sublane are what we're avoiding)
  out    (1, K) f32: 1.0 = keep

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

MAX_K = 2048         # bf16 (K,K) scratch: 8 MB at 2048 — VMEM ceiling
_ROW_BLOCK = 256     # suppress-matrix build granularity


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic compile path)."""
    try:
        return _HAS_PLTPU and jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def _nms_kernel(iou_threshold: float, data_ref, data_t_ref, keep_ref,
                smat_ref):
    # data_ref: (1, 8, K); data_t_ref: (1, K, 8); keep_ref: (1, 1, K)
    # smat_ref: (K, K) bf16 VMEM scratch
    k = data_ref.shape[2]
    x1r = data_ref[0, 0:1, :]          # (1, K)
    y1r = data_ref[0, 1:2, :]
    x2r = data_ref[0, 2:3, :]
    y2r = data_ref[0, 3:4, :]
    clsr = data_ref[0, 4:5, :]
    valid = data_ref[0, 5:6, :]

    area_r = (x2r - x1r) * (y2r - y1r)                     # (1, K)

    # ---- phase 1: upper-triangular suppress matrix, in row blocks ----
    nb = _ROW_BLOCK if k % _ROW_BLOCK == 0 else 128  # k is a multiple of 128
    cols_j = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)

    def build_block(bi, _):
        r0 = bi * nb
        x1c = data_t_ref[0, pl.ds(r0, nb), 0:1]            # (nb, 1)
        y1c = data_t_ref[0, pl.ds(r0, nb), 1:2]
        x2c = data_t_ref[0, pl.ds(r0, nb), 2:3]
        y2c = data_t_ref[0, pl.ds(r0, nb), 3:4]
        clsc = data_t_ref[0, pl.ds(r0, nb), 4:5]
        area_c = (x2c - x1c) * (y2c - y1c)                 # (nb, 1)
        iw = jnp.maximum(jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0)
        ih = jnp.maximum(jnp.minimum(y2c, y2r) - jnp.maximum(y1c, y1r), 0.0)
        inter = iw * ih                                    # (nb, K)
        iou = inter / (area_c + area_r - inter + 1e-7)
        rows_i = r0 + jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
        sup = (iou > iou_threshold) & (clsc == clsr) & (cols_j > rows_i)
        smat_ref[pl.ds(r0, nb), :] = sup.astype(jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, k // nb, build_block, 0)

    # ---- phase 2: fixpoint iteration, S stays in VMEM ----
    def cond(state):
        return state[1]

    def body(state):
        a, _ = state                                        # a: (1, K) f32
        sup = jax.lax.dot_general(
            a.astype(jnp.bfloat16), smat_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, K)
        a_new = jnp.where(sup > 0.5, 0.0, valid)
        return a_new, jnp.any(a_new != a)

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
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
    if not _HAS_PLTPU:
        # without pltpu the VMEM scratch spec can't even be constructed
        # (interpret mode included) — fail readably instead of with a
        # pallas_call arity TypeError
        raise RuntimeError(
            "pallas NMS backend unavailable: jax.experimental.pallas.tpu "
            "failed to import on this jax build; use backend='xla'")
    bs, k, _ = boxes_xyxy.shape
    assert k % 128 == 0, f"K must be a multiple of 128 (lanes), got {k}"
    assert k <= MAX_K, (
        f"K={k}: the (K,K) bf16 suppress-matrix scratch exceeds VMEM above "
        f"{MAX_K}; use the XLA backend for larger pre-NMS candidate counts")

    data = jnp.concatenate([
        boxes_xyxy.transpose(0, 2, 1),                    # (bs, 4, K)
        classes[:, None, :],
        valid[:, None, :].astype(jnp.float32),
        jnp.zeros((bs, 2, k), jnp.float32),
    ], axis=1).astype(jnp.float32)                        # (bs, 8, K)
    data_t = data.transpose(0, 2, 1)                      # (bs, K, 8)

    in_specs = [pl.BlockSpec((1, 8, k), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, k, 8), lambda b: (b, 0, 0))]
    out_specs = pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0))
    scratch = [pltpu.VMEM((k, k), jnp.bfloat16)]
    if not interpret:
        in_specs = [pl.BlockSpec((1, 8, k), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, k, 8), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)]
        out_specs = pl.BlockSpec((1, 1, k), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold),
        out_shape=jax.ShapeDtypeStruct((bs, 1, k), jnp.float32),
        grid=(bs,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(data, data_t)
    return keep[:, 0, :] > 0.0
