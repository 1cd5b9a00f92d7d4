"""Loader factory — the reference's get_loaders equivalent
(reference utils/training_utils.py:31-77)."""

from __future__ import annotations

from typing import Tuple

from yolov5m_tpu.data.augment import TrainAugment
from yolov5m_tpu.data.dataset import BatchLoader, DetectionDataset


def default_multiscale_sizes(image_size: int):
    """Default multi-scale bucket set for non-rect training:
    {0.8, 0.9, 1.0}x image_size snapped to stride-32 multiples —
    [512, 576, 640] at 640. The reference multi-scales every non-rect batch
    by default (reference utils/training_utils.py:99-100, random size in
    [0.5x, 1.05x)); static jit-compiled buckets are the TPU analog, and they
    are ON by default to match (train CLI --no_multi_scale opts out).
    Returns None when the buckets collapse to a single size (tiny images)."""
    sizes = sorted({max(32, round(f * image_size / 32) * 32)
                    for f in (0.8, 0.9, 1.0)})
    return sizes if len(sizes) > 1 else None


def get_loaders(
    db_root_dir: str,
    batch_size: int,
    rect_training: bool = False,
    box_format: str = "coco",
    augment: bool = True,
    max_boxes: int = 120,
    default_size: int = 640,
    seed: int = 0,
    multi_scale_sizes=None,
    num_workers: int = 0,
    mosaic_p: float = 0.0,
    hsv: bool = False,
    device_augment: bool = False,
) -> Tuple[BatchLoader, BatchLoader]:
    """Build train/val BatchLoaders over the standard directory layout.

    device_augment: flips, HSV (via the hsv flag upstream) and color
    jitter run on device (ops/augment_device.py) — the host TrainAugment
    keeps rotate (device rotate is gather-bound and loses, ROUND4_NOTES
    §9) plus its rare cv2-only ops (blur/CLAHE/posterize/channel-
    shuffle), so the batch isn't double-augmented and the host budget
    drops by the two biggest elementwise costs (color jitter + flips)."""
    train_ds = DetectionDataset(
        root_directory=db_root_dir, train=True, rect_training=rect_training,
        default_size=default_size, bs=batch_size, bboxes_format=box_format,
        max_boxes=max_boxes)
    val_ds = DetectionDataset(
        root_directory=db_root_dir, train=False, rect_training=rect_training,
        default_size=default_size, bs=batch_size, bboxes_format=box_format,
        max_boxes=max_boxes)

    host_aug = None
    if augment:
        host_aug = TrainAugment(seed=seed, hflip_p=0.0, vflip_p=0.0,
                                color_jitter_p=0.0) \
            if device_augment else TrainAugment(seed=seed)
    train_loader = BatchLoader(
        train_ds, batch_size,
        shuffle=not rect_training,                    # training_utils.py:57
        augment=host_aug,
        seed=seed, drop_last=True, size_buckets=multi_scale_sizes,
        num_workers=num_workers, mosaic_p=mosaic_p, hsv=hsv)
    val_loader = BatchLoader(val_ds, batch_size, shuffle=False, augment=None,
                             seed=seed, drop_last=False,
                             num_workers=num_workers)
    return train_loader, val_loader
