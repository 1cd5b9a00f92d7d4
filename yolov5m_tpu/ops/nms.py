"""Fixed-shape, fully on-device batched NMS.

TPU-native replacement for the reference's postprocess, which hops to a C++
torchvision kernel per image (reference utils/bboxes_utils.py:175-209,
torchvision.ops.nms at :195). Here the whole pipeline — confidence gating,
xywh→xyxy, greedy class-aware suppression, top-300 cap — is one jitted XLA
graph with static shapes, so boxes never leave the device and there is
exactly one compilation per (N, K) configuration.

Suppression backends, identical semantics (all exactly greedy):
  * "xla"      — batched MXU fixpoint iteration over the K×K suppress matrix
                 (see _greedy_suppress_fixpoint; converges in ~suppression-
                 chain-depth matvecs instead of K sequential loop steps);
  * "xla_loop" — the K-step masked fori_loop (kept as the simple reference
                 backend and for A/B benchmarking);
  * "pallas"   — VMEM-resident kernel: the suppress matrix never leaves VMEM
                 across fixpoint iterations (ops/pallas/nms_kernel.py).

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

from yolov5m_tpu.ops.boxes import pairwise_iou_xyxy, xywh_to_xyxy

NEG_INF = -1e10


def _greedy_suppress(suppress_matrix: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates (XLA backend).

    Args:
      suppress_matrix: (K, K) bool, True where row i suppresses column j
        (iou > threshold and same class). Rows/cols are score-descending.
      valid: (K,) bool, candidate passes the confidence threshold.
    Returns:
      (K,) bool keep mask.
    """
    k = suppress_matrix.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)[0]

    # NOTE: static trip count on purpose. A while_loop bounded by the valid-
    # candidate count looks like a win (valid rows are a sorted prefix), but
    # under vmap a traced-bound loop compiles ~75x slower per iteration on
    # TPU (measured 463ms vs 49ms for the full pipeline at K=1024). The
    # Pallas backend keeps the dynamic bound — Mosaic handles it fine.
    def body(i, alive):
        keeper = alive[i] & valid[i]
        row = suppress_matrix[i] & (col_ids > i)
        return jnp.where(keeper, alive & ~row, alive)

    return jax.lax.fori_loop(0, k, body, valid)


def _greedy_suppress_fixpoint(smat: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Greedy NMS via fixpoint iteration — the fast batched backend.

    Greedy NMS is the unique fixpoint of
        F(a)[j] = valid[j] & not OR_{i<j} (a[i] & S[i,j])
    (induction over positions: any fixpoint agrees with greedy on position 0,
    and agreement on all i<j forces agreement on j). Iterating F from
    a0 = valid extends the greedy-correct prefix by >=1 position per step, so
    it terminates, and in practice converges in suppression-chain-depth
    steps (<~6 after score sorting) — each step ONE batched MXU matvec
    instead of the K sequential masked updates of _greedy_suppress.

    Args:
      smat: (bs, K, K) 0/1 suppress matrix in a matmul dtype (bf16/f32),
        already masked to same-class, IoU>threshold, strictly upper-
        triangular (j > i). Rows/cols score-descending.
      valid: (bs, K) bool.
    Returns:
      (bs, K) bool keep mask, bit-identical to the sequential greedy scan.
    """
    def cond(state):
        return state[1]

    def body(state):
        a, _ = state
        # OR_{i} a[i] & S[i,j] as a matvec: entries are 0/1 so the sum is
        # positive iff any suppressor is alive (f32 accumulation, no
        # cancellation — safe for any K)
        sup = jnp.einsum("bi,bij->bj", a.astype(smat.dtype), smat,
                         preferred_element_type=jnp.float32) > 0.5
        a_new = valid & ~sup
        return a_new, jnp.any(a_new != a)

    a, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    return a


BACKENDS = ("auto", "xla", "xla_loop", "pallas")


def resolve_backend(backend: str, k: int) -> str:
    """Resolve backend="auto" to the fastest backend for this K.

    Measured (healthy v5e window, 2026-08-17, interleaved arms, full fused
    pipeline at bs=64 — see ROUND2_NOTES.md):
        K=1024: pallas 49.41 ms | xla 49.86 | xla_loop 50.75
        K=2048: pallas 53.78 ms | xla 55.22 | xla_loop 57.47
    The Pallas kernel (suppress matrix built AND consumed in VMEM) wins at
    both K, with the margin growing with K (the XLA fixpoint re-streams the
    (K,K) matrix from HBM every iteration). Policy: pallas on real TPU
    backends while K fits its VMEM cap; XLA fixpoint otherwise (CPU tests,
    huge K).
    """
    if backend not in BACKENDS:
        raise ValueError(f"unknown NMS backend {backend!r}; one of {BACKENDS}")
    if backend != "auto":
        return backend
    from yolov5m_tpu.ops.pallas import MAX_K, pallas_available
    if pallas_available() and k <= MAX_K and k % 128 == 0:
        return "pallas"
    return "xla"


def _suppress_matrix(boxes: jnp.ndarray, cls: jnp.ndarray,
                     iou_threshold: float) -> jnp.ndarray:
    """(bs, K, K) bf16 0/1 matrix: i suppresses j (same class, IoU>t, j>i)."""
    k = boxes.shape[1]
    iou = jax.vmap(pairwise_iou_xyxy)(boxes, boxes)
    same = cls[:, :, None] == cls[:, None, :]
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols_j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    mat = (iou > iou_threshold) & same & (cols_j > rows_i)[None]
    return mat.astype(jnp.bfloat16)


def _prepare(rows: jnp.ndarray, conf_threshold: float, k: int):
    """Per-image: confidence gate + top-K + xywh→xyxy.

    rows: (N, 6) (class, conf, cx, cy, w, h). Returns (boxes (K,4), cls (K,),
    conf (K,), valid (K,)) sorted by descending confidence.
    """
    conf = rows[:, 1]
    gated = jnp.where(conf > conf_threshold, conf, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(gated, k)
    cand = rows[top_idx]
    valid = top_scores > NEG_INF / 2
    return xywh_to_xyxy(cand[:, 2:6]), cand[:, 0], cand[:, 1], valid


def suppress(boxes, cls, valid, iou_threshold, backend="xla",
             interpret=False):
    """Greedy class-aware suppression over score-sorted candidates — the
    single backend dispatch point (batched_nms and ops.postprocess.
    fused_detect both route here, so the backends cannot drift between the
    fused and unfused pipelines).

    Args:
      boxes: (bs, K, 4) xyxy, descending-score order.
      cls: (bs, K) class ids; valid: (bs, K) bool.
      backend: resolved backend name ("xla" | "xla_loop" | "pallas").
      interpret: run the pallas kernel in interpreter mode (CPU testing).
    Returns:
      (bs, K) bool keep mask — identical across backends (pinned by
      tests/test_decode_nms.py backend-equality tests).
    """
    if backend == "pallas":
        from yolov5m_tpu.ops.pallas import greedy_suppress_pallas
        return greedy_suppress_pallas(boxes, cls, valid, iou_threshold,
                                      interpret=interpret)
    if backend == "xla_loop":
        def suppress_one(b, c, v):
            iou = pairwise_iou_xyxy(b, b)
            mat = (iou > iou_threshold) & (c[:, None] == c[None, :])
            return _greedy_suppress(mat, v)

        return jax.vmap(suppress_one)(boxes, cls, valid)
    return _greedy_suppress_fixpoint(
        _suppress_matrix(boxes, cls, iou_threshold), valid)


def _compact(boxes, cls, conf, keep, max_detections: int):
    """Scatter kept (score-sorted) rows into the first max_detections slots."""
    k = keep.shape[0]
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < max_detections), rank, max_detections)
    out_rows = jnp.concatenate([cls[:, None], conf[:, None], boxes], axis=-1)
    out = jnp.zeros((max_detections + 1, 6), out_rows.dtype).at[slot].set(out_rows)
    valid = jnp.zeros((max_detections + 1,), jnp.bool_).at[slot].set(keep)
    return out[:max_detections], valid[:max_detections]


def nms_single(rows, iou_threshold, conf_threshold, max_detections=300,
               pre_nms_topk=1024):
    """NMS for one image (XLA backend). rows: (N, 6)."""
    out, valid = batched_nms(rows[None], iou_threshold, conf_threshold,
                             max_detections, pre_nms_topk)
    return out[0], valid[0]


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "conf_threshold",
                              "max_detections", "pre_nms_topk", "backend",
                              "interpret"))
def batched_nms(rows, iou_threshold, conf_threshold, max_detections=300,
                pre_nms_topk=1024, backend="auto", interpret=False):
    """Batched NMS, one fixed-shape XLA computation (replaces the reference's
    per-image Python loop over torchvision.ops.nms, bboxes_utils.py:184-209).

    Args:
      rows: (bs, N, 6) decoded rows (class, conf, cx, cy, w, h).
      backend: "xla" | "pallas" (see module docstring).
    Returns:
      out: (bs, max_detections, 6) rows (class, conf, x1, y1, x2, y2).
      valid: (bs, max_detections) bool.
    """
    n = rows.shape[1]
    k = min(pre_nms_topk, n)
    backend = resolve_backend(backend, k)

    boxes, cls, conf, valid = jax.vmap(
        functools.partial(_prepare, conf_threshold=conf_threshold, k=k))(rows)

    keep = suppress(boxes, cls, valid, iou_threshold, backend=backend,
                    interpret=interpret)

    return jax.vmap(functools.partial(_compact, max_detections=max_detections))(
        boxes, cls, conf, keep)
