"""Fused postprocess must match the two-stage decode+NMS pipeline exactly."""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, STRIDES
from yolov5m_tpu.ops.decode import decode_predictions
from yolov5m_tpu.ops.nms import batched_nms
from yolov5m_tpu.ops.postprocess import fused_detect


def _norm_anchors():
    a = np.asarray(ANCHORS, np.float32)
    return a / np.asarray(STRIDES, np.float32)[:, None, None]


def _preds(rng, bs=2, hw=64, nc=7):
    shapes = [(bs, 3, hw // s, hw // s, 5 + nc) for s in STRIDES]
    # spread objectness so the confidence gate has both sides
    out = []
    for s in shapes:
        p = rng.normal(0, 1.5, s).astype(np.float32)
        out.append(p)
    return [jnp.asarray(p) for p in out]


def test_fused_matches_two_stage(rng):
    # gate="sort": exact top-k in ANY survivor regime (these random logits
    # flood the gate far past capacity — the compact gate's documented
    # index-truncation regime, so it is exercised separately below)
    preds = _preds(rng)
    anchors = jnp.asarray(_norm_anchors())

    rows = decode_predictions(preds, anchors)
    out_ref, valid_ref = batched_nms(rows, 0.5, 0.3, 300, 128)
    out_f, valid_f = fused_detect(preds, anchors, conf_threshold=0.3,
                                  iou_threshold=0.5, max_detections=300,
                                  pre_nms_topk=128, gate="sort")
    np.testing.assert_array_equal(np.asarray(valid_ref), np.asarray(valid_f))
    a, b = np.asarray(out_ref), np.asarray(out_f)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_fused_orders_saturated_ties_by_logit():
    """Documented tie-break divergence (module docstring): when several
    overlapping candidates SATURATE to conf==1.0 in f32 (obj logit >~17),
    the unfused path falls back to flat-index order while the fused path
    still ranks by the true logits — so fused keeps the HIGHER-LOGIT member
    of the cluster. This pins both halves of that statement."""
    nc = 3
    # one P3 layer only: 2 anchors in cell (0,0), same class, overlapping
    # boxes, obj logits 18 vs 20 — both sigmoid() to exactly 1.0 in f32
    p = np.full((1, 3, 4, 4, 5 + nc), -20.0, np.float32)
    for a, logit in ((0, 18.0), (1, 20.0)):
        p[0, a, 0, 0, :2] = 0.0          # txy: center of the cell
        p[0, a, 0, 0, 2:4] = 0.0         # twh: anchor-sized box
        p[0, a, 0, 0, 4] = logit
        p[0, a, 0, 0, 5] = 9.0           # class 0
    anchors = jnp.asarray([[[1.0, 1.0], [1.08, 1.08], [3.0, 3.0]]],
                          jnp.float32)
    preds = [jnp.asarray(p)]
    kw = dict(conf_threshold=0.25, iou_threshold=0.5, max_detections=10,
              pre_nms_topk=128)

    rows = decode_predictions(preds, anchors, strides=(8,))
    assert float(jnp.max(rows[..., 1])) == 1.0  # really saturated
    out_u, valid_u = batched_nms(rows, kw["iou_threshold"],
                                 kw["conf_threshold"], 10, 128)
    out_f, valid_f = fused_detect(preds, anchors, strides=(8,),
                                  gate="sort", **kw)
    assert int(np.asarray(valid_u).sum()) == 1
    assert int(np.asarray(valid_f).sum()) == 1
    w_unfused = float(out_u[0, 0, 4] - out_u[0, 0, 2])   # x2 - x1
    w_fused = float(out_f[0, 0, 4] - out_f[0, 0, 2])
    assert w_unfused == 8.0 * 1.0        # index-first: the logit-18 box
    assert abs(w_fused - 8.0 * 1.08) < 1e-4  # logit-first: the logit-20 box


def test_fused_pallas_backend_matches_xla_interpret(rng):
    """The FUSED pipeline's pallas suppression (interpret mode on CPU) must
    match its XLA fixpoint backend — both route through ops.nms.suppress,
    the single backend dispatch point shared with batched_nms."""
    preds = _preds(rng)
    anchors = jnp.asarray(_norm_anchors())
    kw = dict(conf_threshold=0.3, iou_threshold=0.5, max_detections=300,
              pre_nms_topk=128, gate="sort")
    out_x, valid_x = fused_detect(preds, anchors, backend="xla", **kw)
    out_p, valid_p = fused_detect(preds, anchors, backend="pallas",
                                  interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(valid_x), np.asarray(valid_p))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p),
                               rtol=1e-6)


def test_fused_bf16_inputs(rng):
    preds = [p.astype(jnp.bfloat16) for p in _preds(rng)]
    anchors = jnp.asarray(_norm_anchors())
    out, valid = fused_detect(preds, anchors, conf_threshold=0.3,
                              iou_threshold=0.5, pre_nms_topk=128)
    assert out.dtype == jnp.float32
    v = np.asarray(valid)
    assert v.sum() > 0
    kept = np.asarray(out)[v]
    assert np.all(kept[:, 1] > 0.3 - 1e-3)  # conf above threshold


def test_fused_empty(rng):
    preds = [jnp.full((1, 3, s, s, 12), -20.0) for s in (8, 4, 2)]
    anchors = jnp.asarray(_norm_anchors())
    out, valid = fused_detect(preds, anchors, conf_threshold=0.25,
                              pre_nms_topk=128)
    assert int(np.asarray(valid).sum()) == 0


def test_serving_topk_is_lossless_below_capacity(rng):
    """cfg.topk_for_conf shrinks K to 512 at serving confidence (>= 0.25).
    Whenever fewer candidates pass the gate than the smaller K, results are
    IDENTICAL to the full-capacity run — the top-k merely truncates the
    NEG_INF-padded tail. (Round-3 A/B: K=512 is ~5% faster e2e at bs=128.)"""
    from yolov5m_tpu.config import Config

    cfg = Config()
    assert cfg.topk_for_conf(0.25) == 512
    assert cfg.topk_for_conf(0.3) == 512
    assert cfg.topk_for_conf(0.01) == cfg.pre_nms_topk

    # sparse positives: ~40 gate survivors, far below both capacities
    preds = []
    for s in (8, 4, 2):
        p = rng.normal(0, 1.0, (2, 3, s, s, 12)).astype(np.float32)
        p[..., 4] = -8.0
        flat_n = 3 * s * s
        hot = rng.choice(flat_n, size=min(8, flat_n), replace=False)
        for h in hot:
            a, rem = divmod(h, s * s)
            y, x = divmod(rem, s)
            p[:, a, y, x, 4] = rng.uniform(0.5, 3.0)
        preds.append(jnp.asarray(p))
    anchors = jnp.asarray(_norm_anchors())

    out_small, valid_small = fused_detect(preds, anchors, conf_threshold=0.25,
                                          iou_threshold=0.5, pre_nms_topk=64)
    out_big, valid_big = fused_detect(preds, anchors, conf_threshold=0.25,
                                      iou_threshold=0.5, pre_nms_topk=256)
    np.testing.assert_array_equal(np.asarray(valid_small),
                                  np.asarray(valid_big))
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_big),
                               rtol=1e-6, atol=1e-6)
    assert int(np.asarray(valid_small).sum()) > 0


def _sparse_preds(rng, hot_per_scale=8):
    """~3x8 gate survivors at conf 0.25: the realistic serving regime."""
    preds = []
    for s in (8, 4, 2):
        p = rng.normal(0, 1.0, (2, 3, s, s, 12)).astype(np.float32)
        p[..., 4] = -8.0
        flat_n = 3 * s * s
        hot = rng.choice(flat_n, size=min(hot_per_scale, flat_n),
                         replace=False)
        for h in hot:
            a, rem = divmod(h, s * s)
            y, x = divmod(rem, s)
            p[:, a, y, x, 4] = rng.uniform(0.5, 3.0)
        preds.append(jnp.asarray(p))
    return preds


def test_bf16_gate_matches_f32_cast(rng):
    """bf16 preds and their f32 casts must produce IDENTICAL detections:
    the head already rounded to bf16, and the f32 upcast before the gate is
    monotone and tie-preserving. (A bf16-native gate was A/B'd on chip and
    measured 0.964x of the f32 gate — top_k is faster on f32 — so the f32
    upcast stays; this test pins the dtype-invariance either way.)"""
    preds_bf16 = [p.astype(jnp.bfloat16) for p in _preds(rng)]
    preds_f32 = [p.astype(jnp.float32) for p in preds_bf16]
    anchors = jnp.asarray(_norm_anchors())
    kw = dict(conf_threshold=0.3, iou_threshold=0.5, max_detections=64,
              pre_nms_topk=128)
    out_b, valid_b = fused_detect(preds_bf16, anchors, **kw)
    out_f, valid_f = fused_detect(preds_f32, anchors, **kw)
    np.testing.assert_array_equal(np.asarray(valid_b), np.asarray(valid_f))
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_f))
    assert int(np.asarray(valid_b).sum()) > 0


def test_gate_compact_equals_sort_below_capacity(rng):
    """The compact gate (cumsum+searchsorted) is bitwise-identical to the
    full sort whenever the survivors fit in K — the regime
    Config.topk_for_conf guarantees. (Compact measured slower on chip, so
    it is an option, not the default — ops/postprocess.py.)"""
    preds = _sparse_preds(rng)
    anchors = jnp.asarray(_norm_anchors())
    kw = dict(conf_threshold=0.25, iou_threshold=0.5, max_detections=32,
              pre_nms_topk=64)
    out_s, valid_s = fused_detect(preds, anchors, gate="sort", **kw)
    out_c, valid_c = fused_detect(preds, anchors, gate="compact", **kw)
    np.testing.assert_array_equal(np.asarray(valid_s), np.asarray(valid_c))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_c))
    assert int(np.asarray(valid_s).sum()) > 0
    # "auto" routes to sort (compact measured 0.888x of sort on chip);
    # below capacity all three agree anyway
    out_a, valid_a = fused_detect(preds, anchors, gate="auto", **kw)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_s))


def test_gate_compact_overflow_keeps_lowest_index_survivors(rng):
    """Above capacity the compact gate keeps the K lowest-INDEX survivors
    (documented serving truncation), score-sorted for NMS."""
    from yolov5m_tpu.ops.nms import NEG_INF
    from yolov5m_tpu.ops.postprocess import _gate_compact, _gate_topk_sort

    n, k = 64, 8
    scores = rng.uniform(0.1, 5.0, (1, n)).astype(np.float32)
    mask = rng.uniform(size=(1, n)) < 0.5          # ~32 survivors > k
    gated = jnp.where(jnp.asarray(mask), jnp.asarray(scores), NEG_INF)

    logits_c, idx_c, valid_c = _gate_compact(gated, k)
    surv = np.flatnonzero(mask[0])
    expect = surv[:k]                               # lowest-index k survivors
    assert set(np.asarray(idx_c)[0].tolist()) == set(expect.tolist())
    assert bool(np.asarray(valid_c).all())
    lc = np.asarray(logits_c)[0]
    assert np.all(lc[:-1] >= lc[1:]), "NMS needs descending-score order"

    # below capacity both gates agree on every VALID slot (invalid slots are
    # NEG_INF don't-cares whose filler indices legitimately differ; NMS and
    # _compact never read them — the e2e equality test above pins that)
    few = jnp.where(jnp.asarray(np.arange(n) < 5)[None], jnp.asarray(scores),
                    NEG_INF)
    lc2, ic2, vc2 = (np.asarray(x) for x in _gate_compact(few, k))
    ls2, is2, vs2 = (np.asarray(x) for x in _gate_topk_sort(few, k))
    np.testing.assert_array_equal(vc2, vs2)
    np.testing.assert_array_equal(lc2, ls2)
    np.testing.assert_array_equal(ic2[vc2], is2[vs2])
