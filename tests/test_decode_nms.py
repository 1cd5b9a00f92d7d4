"""Tests for grid decode and fixed-shape NMS.

Decode goldens use an independent numpy transcription of the reference decode
formulas (reference utils/plot_utils.py:10-54). NMS is validated against a
straightforward numpy greedy NMS with torchvision semantics (suppress same
class with IoU > threshold, keep by score order, cap 300 — reference
bboxes_utils.py:175-209).
"""

import numpy as np
import jax.numpy as jnp

from yolov5m_tpu.config import ANCHORS, STRIDES
from yolov5m_tpu.ops import decode_predictions, decode_grid_targets, batched_nms, make_grid


def _norm_anchors():
    a = np.asarray(ANCHORS, np.float32)  # (3,3,2) pixels
    return a / np.asarray(STRIDES, np.float32)[:, None, None]


def np_decode_pred(preds, anchors_px):
    """Numpy golden for the is_pred=True path of reference cells_to_bboxes."""
    outs = []
    for i, raw in enumerate(preds):
        bs, na, ny, nx, no = raw.shape
        p = 1 / (1 + np.exp(-raw.astype(np.float64)))
        gx, gy = np.meshgrid(np.arange(nx), np.arange(ny))
        grid = np.stack([gx, gy], -1)[None, None]  # (1,1,ny,nx,2)
        s = STRIDES[i]
        xy = (2 * p[..., 0:2] + grid - 0.5) * s
        wh = (2 * p[..., 2:4]) ** 2 * anchors_px[i][None, :, None, None, :]
        obj = p[..., 4:5]
        best = np.argmax(p[..., 5:], -1)[..., None].astype(np.float64)
        outs.append(np.concatenate([best, obj, xy, wh], -1).reshape(bs, -1, 6))
    return np.concatenate(outs, 1)


def test_make_grid():
    g = np.asarray(make_grid(3, 4))
    assert g.shape == (3, 4, 2)
    assert g[1, 2, 0] == 2 and g[1, 2, 1] == 1  # (x, y) ordering


def test_decode_predictions_matches_numpy(rng):
    nc, bs = 7, 2
    shapes = [(bs, 3, 8, 8, 5 + nc), (bs, 3, 4, 4, 5 + nc), (bs, 3, 2, 2, 5 + nc)]
    preds = [rng.normal(size=s).astype(np.float32) for s in shapes]
    anchors_n = _norm_anchors()
    got = np.asarray(decode_predictions([jnp.asarray(p) for p in preds], jnp.asarray(anchors_n)))
    exp = np_decode_pred(preds, np.asarray(ANCHORS, np.float32))
    assert got.shape == exp.shape == (bs, 3 * (64 + 16 + 4), 6)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)


def test_decode_grid_targets_golden():
    # one object at cell (y=2, x=3) on scale 0, x_cell=0.5, y_cell=0.25,
    # w_cell=4, h_cell=2, class 5
    bs, na, ny, nx = 1, 3, 8, 8
    t0 = np.zeros((bs, na, ny, nx, 6), np.float32)
    t0[0, 1, 2, 3] = [0.5, 0.25, 4.0, 2.0, 1.0, 5.0]
    t1 = np.zeros((bs, na, 4, 4, 6), np.float32)
    t2 = np.zeros((bs, na, 2, 2, 6), np.float32)
    rows = np.asarray(decode_grid_targets([jnp.asarray(t) for t in (t0, t1, t2)]))
    obj_rows = rows[0][rows[0][:, 1] == 1.0]
    assert obj_rows.shape == (1, 6)
    # xy = (cell + offset) * stride; wh = cell_units * stride
    np.testing.assert_allclose(obj_rows[0], [5.0, 1.0, (3 + 0.5) * 8, (2 + 0.25) * 8, 32.0, 16.0])


def np_greedy_nms(rows, iou_t, conf_t, max_det=300):
    """Numpy reference NMS (torchvision semantics, class-aware, score-ordered)."""
    keep_rows = []
    r = rows[rows[:, 1] > conf_t]
    boxes = np.concatenate(
        [r[:, 2:4] - r[:, 4:6] / 2, r[:, 2:4] + r[:, 4:6] / 2], -1)
    order = np.argsort(-r[:, 1], kind="stable")
    boxes, r = boxes[order], r[order]
    alive = np.ones(len(r), bool)
    for i in range(len(r)):
        if not alive[i]:
            continue
        keep_rows.append(np.concatenate([[r[i, 0], r[i, 1]], boxes[i]]))
        for j in range(i + 1, len(r)):
            if not alive[j] or r[j, 0] != r[i, 0]:
                continue
            ix = max(0, min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]))
            iy = max(0, min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]))
            inter = ix * iy
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (ai + aj - inter + 1e-7) > iou_t:
                alive[j] = False
    return np.asarray(keep_rows[:max_det]).reshape(-1, 6)


def _random_rows(rng, n, nc=5, size=640):
    cls = rng.integers(0, nc, n).astype(np.float32)
    conf = rng.uniform(0, 1, n).astype(np.float32)
    cx = rng.uniform(100, size - 100, n).astype(np.float32)
    cy = rng.uniform(100, size - 100, n).astype(np.float32)
    w = rng.uniform(20, 150, n).astype(np.float32)
    h = rng.uniform(20, 150, n).astype(np.float32)
    return np.stack([cls, conf, cx, cy, w, h], -1)


def test_nms_matches_numpy_reference(rng):
    rows = _random_rows(rng, 200)
    out, valid = batched_nms(jnp.asarray(rows[None]), iou_threshold=0.5,
                             conf_threshold=0.25, max_detections=300, pre_nms_topk=200)
    got = np.asarray(out[0])[np.asarray(valid[0])]
    exp = np_greedy_nms(rows, 0.5, 0.25)
    assert got.shape == exp.shape
    # same score ordering → compare row by row
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-3)


def test_nms_cross_class_no_suppression():
    # two perfectly overlapping boxes, different classes → both kept
    rows = np.array([
        [0, 0.9, 100, 100, 50, 50],
        [1, 0.8, 100, 100, 50, 50],
    ], np.float32)
    out, valid = batched_nms(jnp.asarray(rows[None]), 0.5, 0.1, 300, 16)
    assert int(np.asarray(valid).sum()) == 2


def test_nms_same_class_suppression_and_cap():
    rows = np.array([
        [0, 0.9, 100, 100, 50, 50],
        [0, 0.8, 102, 102, 50, 50],   # heavy overlap, suppressed
        [0, 0.7, 400, 400, 50, 50],   # far away, kept
    ], np.float32)
    out, valid = batched_nms(jnp.asarray(rows[None]), 0.5, 0.1, 300, 16)
    v = np.asarray(valid[0])
    kept = np.asarray(out[0])[v]
    assert len(kept) == 2
    np.testing.assert_allclose(kept[:, 1], [0.9, 0.7])


def test_nms_max_detections_cap(rng):
    rows = _random_rows(rng, 100, nc=100)  # all distinct classes → nothing suppressed
    rows[:, 0] = np.arange(100)
    out, valid = batched_nms(jnp.asarray(rows[None]), 0.5, 0.0, 10, 128)
    assert out.shape == (1, 10, 6)
    assert int(np.asarray(valid).sum()) == 10
    # highest-confidence rows kept
    np.testing.assert_allclose(
        np.sort(np.asarray(out[0])[:, 1])[::-1], np.sort(rows[:, 1])[::-1][:10], rtol=1e-5)


def test_nms_empty_input():
    rows = np.zeros((1, 50, 6), np.float32)  # conf all 0 → below threshold
    out, valid = batched_nms(jnp.asarray(rows), 0.5, 0.25, 300, 50)
    assert int(np.asarray(valid).sum()) == 0


def test_nms_batched_consistency(rng):
    batch = np.stack([_random_rows(rng, 64) for _ in range(4)])
    out_b, valid_b = batched_nms(jnp.asarray(batch), 0.6, 0.01, 300, 64)
    for i in range(4):
        out_s, valid_s = batched_nms(jnp.asarray(batch[i][None]), 0.6, 0.01, 300, 64)
        np.testing.assert_allclose(np.asarray(out_b[i]), np.asarray(out_s[0]), rtol=1e-6)


def test_nms_pallas_backend_matches_xla(rng):
    """Pallas greedy-suppression kernel (interpret mode on CPU) must produce
    identical keep decisions to the XLA matrix backend."""
    batch = np.stack([_random_rows(rng, 256) for _ in range(3)])
    out_x, valid_x = batched_nms(jnp.asarray(batch), 0.55, 0.1, 300, 128)
    out_p, valid_p = batched_nms(jnp.asarray(batch), 0.55, 0.1, 300, 128,
                                 backend="pallas", interpret=True)
    np.testing.assert_array_equal(np.asarray(valid_x), np.asarray(valid_p))
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(out_p), rtol=1e-6)


def test_nms_pallas_empty_and_cap(rng):
    rows = np.zeros((1, 128, 6), np.float32)
    out, valid = batched_nms(jnp.asarray(rows), 0.5, 0.25, 300, 128,
                             backend="pallas", interpret=True)
    assert int(np.asarray(valid).sum()) == 0


def test_nms_fixpoint_matches_loop_backend(rng):
    """Default (fixpoint) backend vs the sequential fori_loop backend must be
    bit-identical on random data."""
    batch = np.stack([_random_rows(rng, 256) for _ in range(4)])
    out_f, valid_f = batched_nms(jnp.asarray(batch), 0.55, 0.1, 300, 128)
    out_l, valid_l = batched_nms(jnp.asarray(batch), 0.55, 0.1, 300, 128,
                                 backend="xla_loop")
    np.testing.assert_array_equal(np.asarray(valid_f), np.asarray(valid_l))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_l), rtol=1e-6)


def test_nms_fixpoint_worst_case_chain():
    """Adversarial alternating suppression chain: box i overlaps only box
    i±1 (IoU .43), scores descending — greedy keeps exactly the evens. The
    fixpoint iteration needs ~n/2 rounds here (its worst case), so this
    catches any fixed-iteration-cap shortcut that isn't a true fixpoint."""
    n = 64
    rows = np.zeros((n, 6), np.float32)
    for i in range(n):
        rows[i] = [0, 0.99 - i * 0.01, 20.0 * i + 25.0, 100.0, 50.0, 50.0]
    out, valid = batched_nms(jnp.asarray(rows[None]), 0.3, 0.01, 300, 128)
    kept = np.asarray(out[0])[np.asarray(valid[0])]
    exp = np_greedy_nms(rows, 0.3, 0.01)
    np.testing.assert_allclose(kept, exp, rtol=1e-5)
    # sanity: the survivors are exactly the even-indexed boxes
    np.testing.assert_allclose(sorted(kept[:, 2]),
                               [20.0 * i for i in range(0, n, 2)], atol=1e-3)
