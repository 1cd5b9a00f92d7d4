"""mAP metric tests: hand-computed golden cases + degenerate inputs."""

import numpy as np

from yolov5m_tpu.eval.metrics import MeanAveragePrecision


def _box(x1, y1, x2, y2):
    return [x1, y1, x2, y2]


def test_perfect_predictions():
    m = MeanAveragePrecision()
    boxes = np.array([_box(10, 10, 50, 50), _box(100, 100, 200, 180)])
    m.update(preds=dict(boxes=boxes, scores=[0.9, 0.8], labels=[0, 1]),
             targets=dict(boxes=boxes, labels=[0, 1]))
    r = m.compute()
    assert r["map_50"] == 1.0
    assert r["map_75"] == 1.0
    assert r["map"] == 1.0


def test_all_misses():
    m = MeanAveragePrecision()
    m.update(preds=dict(boxes=np.array([_box(0, 0, 10, 10)]), scores=[0.9],
                        labels=[0]),
             targets=dict(boxes=np.array([_box(100, 100, 200, 200)]),
                          labels=[0]))
    r = m.compute()
    assert r["map_50"] == 0.0


def test_wrong_class_is_fp():
    m = MeanAveragePrecision()
    box = np.array([_box(10, 10, 50, 50)])
    m.update(preds=dict(boxes=box, scores=[0.9], labels=[1]),
             targets=dict(boxes=box, labels=[0]))
    assert m.compute()["map_50"] == 0.0


def test_half_precision_golden():
    """2 GTs of class 0; detections: 1 TP at conf .9, 1 FP at conf .8.
    PR: (r=.5, p=1) then (r=.5, p=.5). AP = precision 1.0 up to recall .5,
    0 beyond → 101-pt AP = 51/101."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    gts = np.array([_box(0, 0, 10, 10), _box(50, 50, 60, 60)])
    dets = np.array([_box(0, 0, 10, 10), _box(200, 200, 220, 220)])
    m.update(preds=dict(boxes=dets, scores=[0.9, 0.8], labels=[0, 0]),
             targets=dict(boxes=gts, labels=[0]*2))
    np.testing.assert_allclose(m.compute()["map_50"], 51 / 101, atol=1e-6)


def test_iou_threshold_separates_50_75():
    """A detection with IoU ≈ 0.6: TP at 0.5, FP at 0.75."""
    m = MeanAveragePrecision()
    gt = np.array([_box(0, 0, 100, 100)])
    det = np.array([_box(0, 0, 100, 60)])  # iou = 0.6
    m.update(preds=dict(boxes=det, scores=[0.9], labels=[0]),
             targets=dict(boxes=gt, labels=[0]))
    r = m.compute()
    assert r["map_50"] == 1.0
    assert r["map_75"] == 0.0


def test_duplicate_detections_one_tp():
    """Two overlapping detections of the same GT: second is FP (GT taken)."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    gt = np.array([_box(0, 0, 100, 100)])
    det = np.array([_box(0, 0, 100, 100), _box(1, 1, 101, 101)])
    m.update(preds=dict(boxes=det, scores=[0.9, 0.85], labels=[0, 0]),
             targets=dict(boxes=gt, labels=[0]))
    # 1 GT: TP@conf.9 → (r=1, p=1); FP@.85 → (r=1, p=.5); AP = 1.0
    np.testing.assert_allclose(m.compute()["map_50"], 1.0, atol=1e-6)


def test_streaming_multiple_images():
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    box = np.array([_box(0, 0, 10, 10)])
    # image 1: perfect; image 2: miss
    m.update(preds=dict(boxes=box, scores=[0.9], labels=[0]),
             targets=dict(boxes=box, labels=[0]))
    m.update(preds=dict(boxes=np.zeros((0, 4)), scores=[], labels=[]),
             targets=dict(boxes=box, labels=[0]))
    # 2 GT, 1 TP at top conf: precision 1 up to recall 0.5
    np.testing.assert_allclose(m.compute()["map_50"], 51 / 101, atol=1e-6)


def test_empty_everything():
    m = MeanAveragePrecision()
    assert m.compute()["map_50"] == -1.0


def test_classes_averaged():
    """class 0 perfect, class 1 all missed → mAP50 = 0.5."""
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    box = np.array([_box(0, 0, 10, 10)])
    far = np.array([_box(500, 500, 510, 510)])
    m.update(preds=dict(boxes=np.concatenate([box, far]), scores=[0.9, 0.8],
                        labels=[0, 1]),
             targets=dict(boxes=np.concatenate([box, box + 100]),
                          labels=[0, 1]))
    np.testing.assert_allclose(m.compute()["map_50"], 0.5, atol=1e-6)


def _brute_force_ap(images, iou_t, cls):
    """Independent AP computation, written from the COCO definition without
    reusing MeanAveragePrecision's structures: global score sort, per-image
    greedy matching re-derived from scratch, explicit 101-point integration."""
    dets = []  # (score, image_idx, det_idx)
    n_gt = 0
    for idx, (preds, targets) in enumerate(images):
        for d, (box, score, label) in enumerate(zip(*preds)):
            if label == cls:
                dets.append((score, idx, box))
        n_gt += sum(1 for l in targets[1] if l == cls)
    if n_gt == 0:
        return None
    dets.sort(key=lambda t: -t[0])
    matched = {i: set() for i in range(len(images))}
    tps = []
    for score, img_idx, box in dets:
        gts = [(g, b) for g, (b, l) in enumerate(zip(*images[img_idx][1]))
               if l == cls and g not in matched[img_idx]]
        best, best_iou = None, iou_t
        for g, gbox in gts:
            ix = max(0, min(box[2], gbox[2]) - max(box[0], gbox[0]))
            iy = max(0, min(box[3], gbox[3]) - max(box[1], gbox[1]))
            inter = ix * iy
            u = ((box[2]-box[0])*(box[3]-box[1])
                 + (gbox[2]-gbox[0])*(gbox[3]-gbox[1]) - inter + 1e-9)
            if inter / u >= best_iou:
                best, best_iou = g, inter / u
        if best is not None:
            matched[img_idx].add(best)
            tps.append(1)
        else:
            tps.append(0)
    tp = np.cumsum(tps)
    fp = np.cumsum([1 - t for t in tps])
    recall = tp / n_gt
    prec = tp / np.maximum(tp + fp, 1e-9)
    env = np.maximum.accumulate(prec[::-1])[::-1]
    pts = np.linspace(0, 1, 101)
    idxs = np.searchsorted(recall, pts, side="left")
    interp = np.where(idxs < len(env), env[np.minimum(idxs, len(env)-1)], 0.0)
    return float(interp.mean())


def test_map_matches_brute_force(rng):
    """Streaming mAP vs an independently-coded direct evaluator on random
    multi-image data (greedy best-IoU matching semantics differ slightly in
    tie-breaking: ours takes max-IoU among >= t, brute force the same)."""
    images = []
    m = MeanAveragePrecision(iou_thresholds=[0.5])
    for _ in range(6):
        ng = int(rng.integers(1, 6))
        nd = int(rng.integers(0, 8))
        gt_boxes = []
        for _ in range(ng):
            x1, y1 = rng.uniform(0, 400, 2)
            gt_boxes.append([x1, y1, x1 + rng.uniform(20, 100),
                             y1 + rng.uniform(20, 100)])
        gt_labels = rng.integers(0, 3, ng).tolist()
        det_boxes, det_scores, det_labels = [], [], []
        for _ in range(nd):
            if rng.random() < 0.6 and ng:   # jittered copy of a GT
                g = int(rng.integers(0, ng))
                b = np.asarray(gt_boxes[g]) + rng.normal(0, 6, 4)
                det_labels.append(int(gt_labels[g] if rng.random() < 0.8
                                      else rng.integers(0, 3)))
            else:
                x1, y1 = rng.uniform(0, 400, 2)
                b = [x1, y1, x1 + rng.uniform(20, 100), y1 + rng.uniform(20, 100)]
                det_labels.append(int(rng.integers(0, 3)))
            det_boxes.append(np.asarray(b, np.float64))
            det_scores.append(float(rng.uniform(0.1, 1)))
        m.update(preds=dict(boxes=np.asarray(det_boxes).reshape(-1, 4),
                            scores=det_scores, labels=det_labels),
                 targets=dict(boxes=np.asarray(gt_boxes), labels=gt_labels))
        images.append(((det_boxes, det_scores, det_labels),
                       (gt_boxes, gt_labels)))

    got = m.compute()["map_50"]
    aps = [_brute_force_ap(images, 0.5, c) for c in range(3)]
    aps = [a for a in aps if a is not None]
    np.testing.assert_allclose(got, np.mean(aps), atol=1e-6)
