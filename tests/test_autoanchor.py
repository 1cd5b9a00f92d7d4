"""Anchor auto-tuning (data/autoanchor.py)."""

import numpy as np

from yolov5m_tpu.config import ANCHORS
from yolov5m_tpu.data.autoanchor import (
    best_possible_recall, check_and_fit, fit_anchors)


def _clustered_wh(rng, centers, n_per=200, spread=1.08):
    whs = []
    for cw, ch in centers:
        f = spread ** rng.normal(0, 1, (n_per, 2))
        whs.append(np.stack([cw * f[:, 0], ch * f[:, 1]], axis=1))
    return np.concatenate(whs).astype(np.float32)


def test_kmeans_recovers_clusters(rng):
    centers = [(10, 20), (50, 40), (200, 300)]
    wh = _clustered_wh(rng, centers)
    anchors = fit_anchors(wh, n_anchors=3)
    # sorted by area; each recovered anchor within ~15% of its true center
    for (aw, ah), (cw, ch) in zip(anchors, centers):
        assert abs(aw - cw) / cw < 0.15 and abs(ah - ch) / ch < 0.15, (
            anchors, centers)


def test_bpr_improves_for_shifted_scale_dataset(rng):
    # boxes far smaller than any COCO anchor: default BPR poor, refit ~1.0
    wh = _clustered_wh(rng, [(4, 5), (6, 3), (8, 8)])
    default = np.asarray(ANCHORS, np.float32).reshape(-1, 2)
    bpr0 = best_possible_recall(wh, default)
    fitted = fit_anchors(wh, n_anchors=9)
    bpr1 = best_possible_recall(wh, fitted)
    assert bpr1 > bpr0
    assert bpr1 > 0.98


def test_check_and_fit_keeps_good_defaults(rng):
    # boxes drawn AT the COCO anchors: defaults already fine, no refit
    wh = _clustered_wh(rng, np.asarray(ANCHORS, np.float32).reshape(-1, 2),
                       n_per=50, spread=1.05)

    class _DS:
        def __len__(self):
            return 1

        def load_item(self, i):
            labels = np.zeros((len(wh), 5), np.float32)
            labels[:, 3:5] = wh / 640.0
            return None, labels

    anchors, info = check_and_fit(_DS(), ANCHORS, image_size=640)
    assert not info["refit"]
    np.testing.assert_array_equal(anchors, np.asarray(ANCHORS, np.float32))
    assert info["bpr_default"] >= 0.98


def test_check_and_fit_refits_bad_defaults(rng):
    wh = _clustered_wh(rng, [(4, 5), (6, 3), (8, 8)])

    class _DS:
        def __len__(self):
            return 1

        def load_item(self, i):
            labels = np.zeros((len(wh), 5), np.float32)
            labels[:, 3:5] = wh / 640.0
            return None, labels

    anchors, info = check_and_fit(_DS(), ANCHORS, image_size=640)
    assert info["refit"] and anchors.shape == (3, 3, 2)
    assert info["bpr_fitted"] > info["bpr_default"]
    # areas ascend across scales like the anchor convention expects
    areas = anchors.reshape(-1, 2).prod(axis=1)
    assert (np.diff(areas) >= -1e-3).all()
