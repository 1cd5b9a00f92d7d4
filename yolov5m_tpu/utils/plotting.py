"""Prediction visualization: box drawing + GT-vs-pred epoch dumps.

Capability parity with the reference's plot utilities (reference
utils/plot_utils.py:57-197: `save_predictions` writes side-by-side GT/pred
images under SAVED_IMAGES/{run}/EPOCH_{n}; `plot_image` draws one image) —
with the broken kwarg chain fixed (the reference's save_predictions passes
`list_output=` into a function that takes `to_list=` and TypeErrors,
plot_utils.py:77-78; train.py:129 flags it).

Matplotlib runs headless (Agg) — figures are saved, never shown interactively
unless requested.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import matplotlib.patches as patches  # noqa: E402

from yolov5m_tpu.config import COCO_LABELS  # noqa: E402


def _colors(n: int):
    cmap = plt.get_cmap("tab20b")
    return [cmap(i) for i in np.linspace(0, 1, max(n, 1))]


def draw_boxes(ax, image: np.ndarray, rows: np.ndarray,
               labels: Sequence[str], with_conf: bool = True) -> None:
    """rows: (n, 6) (class, conf, x1, y1, x2, y2) in pixels."""
    colors = _colors(len(labels))
    ax.imshow(np.clip(image, 0, 1))
    h, w = image.shape[:2]
    for row in rows:
        cls = int(row[0])
        x1 = float(np.clip(row[2], 0, w))
        y1 = float(np.clip(row[3], 0, h))
        x2 = float(np.clip(row[4], 0, w))
        y2 = float(np.clip(row[5], 0, h))
        color = colors[cls % len(colors)]
        ax.add_patch(patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                       linewidth=1.5, edgecolor=color,
                                       facecolor="none"))
        text = labels[cls] if cls < len(labels) else str(cls)
        if with_conf:
            text = f"{text}: {row[1]:.2f}"
        ax.text(x1, y1, text, color="white", verticalalignment="top",
                bbox={"color": color, "pad": 0}, fontsize="xx-small")


def plot_image(image: np.ndarray, rows: np.ndarray,
               labels: Sequence[str] = COCO_LABELS,
               save_path: Optional[str] = None) -> None:
    """One image + detections (reference plot_utils.py:147-197 equivalent)."""
    fig, ax = plt.subplots(1)
    draw_boxes(ax, image, rows, labels)
    if save_path:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
        plt.close(fig)
    else:  # pragma: no cover
        plt.show()


def save_prediction_images(
    images: np.ndarray,
    pred_rows: Iterable[np.ndarray],
    gt_rows: Iterable[np.ndarray],
    folder: str,
    filename: str,
    epoch: int,
    labels: Sequence[str] = COCO_LABELS,
    num_images: int = 5,
) -> int:
    """Side-by-side GT/pred dumps, reference directory layout
    SAVED_IMAGES/{filename}/EPOCH_{epoch}/image_{i}.png (plot_utils.py:61-64).

    Returns the number of files written.
    """
    path = os.path.join(folder, filename, f"EPOCH_{epoch}")
    os.makedirs(path, exist_ok=True)
    written = 0
    for idx, (img, pr, gt) in enumerate(zip(images, pred_rows, gt_rows)):
        if idx >= num_images:
            break
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 5))
        ax1.set_title("Ground Truth bboxes")
        ax2.set_title("Predicted bboxes")
        draw_boxes(ax1, img, gt, labels, with_conf=False)
        draw_boxes(ax2, img, pr, labels)
        fig.savefig(os.path.join(path, f"image_{idx}.png"), dpi=150,
                    bbox_inches="tight")
        plt.close(fig)
        written += 1
    return written
