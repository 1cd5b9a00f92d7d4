"""Sequential numpy goldens for target assignment and loss.

Faithful transcriptions of the reference loss math (reference loss.py:101-246
and ultralytics_loss.py:60-311) written per-image/per-box with plain Python
loops, used to validate the framework's vectorized on-device implementations.

Three documented deviations, matching the framework's defined semantics:
  * ignore cells are excluded from the objectness BCE (the reference feeds
    obj target -1 into BCEWithLogitsLoss, which is unbounded below);
  * positives take precedence over ignore marks regardless of label order
    (the reference's sequential anchor_taken state makes a later box lose its
    positive to an earlier box's ignore mark);
  * a box whose best anchor-cell on a scale is already claimed by an earlier
    box gets NO positive on that scale — the reference instead falls through
    to the scale's next-best anchor at the same cell (anchor_taken walk,
    reference loss.py:159-190). That fallback is label-order-sequential and
    deliberately dropped from the vectorized tournament; see the deviation
    note in yolov5m_tpu/train/targets.py.
"""

import numpy as np

BALANCE = (4.0, 1.0, 0.4)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def bce(logits, labels):
    return np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits)))


def giou_midpoint(a, b, eps=1e-7):
    """(N,4) cxcywh pairs → (N,) GIoU. Matches reference bboxes_utils.py:33-87."""
    ax1, ay1 = a[:, 0] - a[:, 2] / 2, a[:, 1] - a[:, 3] / 2
    ax2, ay2 = a[:, 0] + a[:, 2] / 2, a[:, 1] + a[:, 3] / 2
    bx1, by1 = b[:, 0] - b[:, 2] / 2, b[:, 1] - b[:, 3] / 2
    bx2, by2 = b[:, 0] + b[:, 2] / 2, b[:, 1] + b[:, 3] / 2
    inter = (np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0, None)
             * np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0, None))
    union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter + eps
    iou = inter / union
    cw = np.maximum(ax2, bx2) - np.minimum(ax1, bx1)
    ch = np.maximum(ay2, by2) - np.minimum(ay1, by1)
    c = cw * ch + eps
    return iou - (c - union) / c


def wh_iou9(wh, anchors_px):
    """wh (2,) normalized vs (3,3,2) px anchors → (3,3). Reference
    iou_width_height semantics (bboxes_utils.py:6-29: anchors compared at /640)."""
    a = anchors_px.reshape(9, 2) / 640.0
    inter = np.minimum(wh[0], a[:, 0]) * np.minimum(wh[1], a[:, 1])
    union = wh[0] * wh[1] + a[:, 0] * a[:, 1] - inter
    return (inter / union).reshape(3, 3)


def golden_grid_targets(labels_per_image, anchors_px, grid_sizes, ignore_t=0.5):
    """Sequential transcription of reference loss.py:101-192 per image.

    labels_per_image: list over batch of (ni, 5) arrays (class, x, y, w, h).
    Returns list over scales of (bs, 3, ny, nx, 6).
    """
    bs = len(labels_per_image)
    out = [np.zeros((bs, 3, ny, nx, 6), np.float32) for ny, nx in grid_sizes]
    for b, boxes in enumerate(labels_per_image):
        # positives first (first box wins a contested cell)
        for cls, x, y, w, h in boxes:
            iou = wh_iou9(np.array([w, h]), anchors_px)
            for s, (ny, nx) in enumerate(grid_sizes):
                a = int(np.argmax(iou[s]))
                i = min(int(y * ny), ny - 1)
                j = min(int(x * nx), nx - 1)
                if out[s][b, a, i, j, 4] != 1:
                    out[s][b, a, i, j] = [x * nx - j, y * ny - i, w * nx, h * ny, 1, cls]
        # ignore marks where no positive landed
        for cls, x, y, w, h in boxes:
            iou = wh_iou9(np.array([w, h]), anchors_px)
            for s, (ny, nx) in enumerate(grid_sizes):
                best = int(np.argmax(iou[s]))
                i = min(int(y * ny), ny - 1)
                j = min(int(x * nx), nx - 1)
                for a in range(3):
                    if a != best and iou[s][a] > ignore_t and out[s][b, a, i, j, 4] == 0:
                        out[s][b, a, i, j, 4] = -1
    return out


def golden_custom_loss(preds, labels_per_image, anchors_px, nc,
                       strides=(8, 16, 32), image_size=640):
    """Reference loss.py:195-246 math on golden grid targets."""
    nl = len(preds)
    lam_cls = 0.5 * (nc / 80 * 3 / nl)
    lam_obj = (image_size / 640) ** 2 * 3 / nl
    lam_box = 0.05 * (3 / nl)
    grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
    targets = golden_grid_targets(labels_per_image, anchors_px, grid_sizes)
    bs = preds[0].shape[0]

    lbox = lobj = lcls = 0.0
    for s, (p, t) in enumerate(zip(preds, targets)):
        anchors = anchors_px[s] / strides[s]
        obj = t[..., 4] == 1
        ign = t[..., 4] == -1
        pxy = sigmoid(p[..., 0:2]) * 2 - 0.5
        pwh = (sigmoid(p[..., 2:4]) * 2) ** 2 * anchors[None, :, None, None, :]
        if obj.any():
            pbox = np.concatenate([pxy[obj], pwh[obj]], -1)
            iou = giou_midpoint(pbox, t[..., 0:4][obj])
            lbox += (1 - iou).mean()
            tobj_val = np.clip(iou, 0, None)
        tobj = np.zeros_like(t[..., 4])
        if obj.any():
            tobj[obj] = tobj_val
        keep = ~ign
        lobj += bce(p[..., 4][keep], tobj[keep]).mean() * BALANCE[s]
        if obj.any():
            onehot = np.zeros((obj.sum(), nc), np.float32)
            onehot[np.arange(obj.sum()), t[..., 5][obj].astype(int)] = 1
            lcls += bce(p[..., 5:][obj], onehot).mean()

    total = (lam_box * lbox + lam_obj * lobj + lam_cls * lcls) * bs
    return total, dict(box=lam_box * lbox, obj=lam_obj * lobj, cls=lam_cls * lcls)


def golden_ultra_build(labels_per_image, anchors_px, grid_sizes,
                       strides=(8, 16, 32), anchor_t=4.0):
    """Sequential transcription of reference ultralytics_loss.py:122-311."""
    g = 0.5
    offs = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * g
    per_scale = []
    for s, (ny, nx) in enumerate(grid_sizes):
        anc = anchors_px[s] / strides[s]
        recs = []
        for b, boxes in enumerate(labels_per_image):
            for cls, x, y, w, h in boxes:
                gx, gy = x * nx, y * ny
                gw, gh = w * nx, h * ny
                for a in range(3):
                    r = np.array([gw, gh]) / anc[a]
                    if max(r.max(), (1 / r).max()) >= anchor_t:
                        continue
                    conds = [True,
                             (gx % 1 < g) and (gx > 1),
                             (gy % 1 < g) and (gy > 1),
                             ((nx - gx) % 1 < g) and (nx - gx > 1),
                             ((ny - gy) % 1 < g) and (ny - gy > 1)]
                    for o, ok in enumerate(conds):
                        if not ok:
                            continue
                        gi = int(np.floor(gx - offs[o, 0]))
                        gj = int(np.floor(gy - offs[o, 1]))
                        gi = min(max(gi, 0), nx - 1)
                        gj = min(max(gj, 0), ny - 1)
                        recs.append(dict(b=b, a=a, gj=gj, gi=gi,
                                         tbox=np.array([gx - gi, gy - gj, gw, gh],
                                                       np.float32),
                                         tcls=int(cls), anchor=anc[a]))
        per_scale.append(recs)
    return per_scale


def golden_ultra_loss(preds, labels_per_image, anchors_px, nc,
                      strides=(8, 16, 32), image_size=640):
    """Reference ultralytics_loss.py:60-120 math on golden flat targets."""
    nl = len(preds)
    lam_cls = 0.5 * (nc / 80 * 3 / nl)
    lam_obj = (image_size / 640) ** 2 * 3 / nl
    lam_box = 0.05 * (3 / nl)
    grid_sizes = [(p.shape[2], p.shape[3]) for p in preds]
    per_scale = golden_ultra_build(labels_per_image, anchors_px, grid_sizes, strides)
    bs = preds[0].shape[0]

    lbox = lobj = lcls = 0.0
    for s, (p, recs) in enumerate(zip(preds, per_scale)):
        tobj = np.zeros(p.shape[:4], np.float32)
        if recs:
            rows = np.stack([p[r["b"], r["a"], r["gj"], r["gi"]] for r in recs])
            pxy = sigmoid(rows[:, 0:2]) * 2 - 0.5
            pwh = (sigmoid(rows[:, 2:4]) * 2) ** 2 * np.stack([r["anchor"] for r in recs])
            pbox = np.concatenate([pxy, pwh], -1)
            tbox = np.stack([r["tbox"] for r in recs])
            iou = giou_midpoint(pbox, tbox)
            lbox += (1 - iou).mean()
            iou_d = np.clip(iou, 0, None)
            # max-resolution for duplicate (b,a,gj,gi), matching the framework
            for r, v in zip(recs, iou_d):
                tobj[r["b"], r["a"], r["gj"], r["gi"]] = max(
                    tobj[r["b"], r["a"], r["gj"], r["gi"]], v)
            if nc > 1:
                onehot = np.zeros((len(recs), nc), np.float32)
                onehot[np.arange(len(recs)), [r["tcls"] for r in recs]] = 1
                lcls += bce(rows[:, 5:], onehot).mean()
        lobj += bce(p[..., 4], tobj).mean() * BALANCE[s]

    total = (lam_box * lbox + lam_obj * lobj + lam_cls * lcls) * bs
    return total, dict(box=lam_box * lbox, obj=lam_obj * lobj, cls=lam_cls * lcls)
