"""Configuration for the TPU-native YOLOv5m framework.

Replaces the reference's module-level-constant config (reference config.py:15-53)
with a frozen dataclass + the same default hyperparameters, so runs are
reproducible and configs serialize cleanly. Class-name lists match reference
config.py:55-144.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Anchor priors in pixels at 640x640, 3 per scale (P3/8, P4/16, P5/32).
# Values match reference config.py:33-37.
ANCHORS: Tuple[Tuple[Tuple[int, int], ...], ...] = (
    ((10, 13), (16, 30), (33, 23)),      # P3/8
    ((30, 61), (62, 45), (59, 119)),     # P4/16
    ((116, 90), (156, 198), (373, 326)),  # P5/32
)

STRIDES: Tuple[int, int, int] = (8, 16, 32)

FLIR_LABELS = ("car", "person")

COCO_LABELS = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
)


@dataclasses.dataclass(frozen=True)
class Config:
    """Hyperparameters. Defaults mirror reference config.py:15-29 and train.py:16-33."""

    # Model (reference config.py:15; model.py:178-208)
    first_out: int = 48                  # YOLOv5m width
    nc: int = 80                         # number of classes
    image_size: int = 640

    # Optimizer (reference config.py:20-21; train.py:61)
    learning_rate: float = 5e-4
    weight_decay: float = 5e-4
    max_grad_norm: float = 10.0          # reference training_utils.py:118
    nominal_batch_size: int = 64         # grad accumulation target, training_utils.py:87

    # Loss weighting (reference config.py:17-18; loss.py:32-36)
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0                # ultralytics_loss.py:35
    ignore_iou_thresh: float = 0.5       # loss.py:45
    iou_type: str = "giou"               # giou (reference) | ciou | diou | iou
    label_smoothing: float = 0.0         # Ultralytics-recipe extra (off)
    focal_gamma: float = 0.0             # focal cls/obj BCE (off)

    # Postprocess / eval thresholds (reference config.py:26-29)
    conf_threshold: float = 0.01
    nms_iou_thresh: float = 0.6
    map_iou_thresh: float = 0.5

    # Fixed-shape capacities (TPU-native additions; no reference equivalent —
    # the reference uses ragged per-image lists).
    max_boxes_per_image: int = 120       # padded label capacity
    pre_nms_topk: int = 1024             # candidates entering NMS per image
    max_detections: int = 300            # reference bboxes_utils.py:175

    def topk_for_conf(self, conf_threshold: float) -> int:
        """NMS candidate capacity scaled to the confidence gate. At the
        serving gate (conf >= 0.25) real images yield tens-to-hundreds of
        candidates, so K=512 loses nothing and measures ~5% faster end to
        end (round-3 A/B at bs=128: K=1024 1449 / K=512 1517 img/s); at
        the eval gate (0.01) thousands pass and the full pre_nms_topk
        preserves recall. max_detections=300 stays below either K."""
        if conf_threshold >= 0.25:
            return min(self.pre_nms_topk, 512)
        return self.pre_nms_topk

    # Precision policy
    compute_dtype: str = "bfloat16"      # MXU-friendly; params stay float32

    # Training schedule (reference train.py:22,26)
    epochs: int = 273
    batch_size: int = 16

    # Learning-rate schedule (TPU-native extra; the reference trains at a
    # constant lr, train.py:61 — production YOLOv5 recipes use warmup+cosine)
    lr_schedule: str = "constant"        # constant | cosine
    warmup_steps: int = 0                # linear 0→lr over N optimizer steps
    lr_final: float = 0.01               # cosine floor as a fraction of lr
    guard_nonfinite: bool = False        # skip updates with non-finite grads
    # Run clip/wd/Adam/EMA/accumulation over ONE raveled parameter vector
    # instead of ~300 per-leaf kernels. Measured on chip (round 3,
    # benchmarks/profile_train_flat.py): the flat path is ~3% SLOWER at
    # bs32 (308 vs 318 img/s) — the round-2 "7.5ms per-leaf overhead" was
    # per-call dispatch inflation, and XLA already fuses the per-leaf
    # chain well while ravel/unravel adds copy traffic. Default is the
    # per-leaf layout; --flat_opt opts in (changes the opt_state/accum
    # checkpoint layout; flags must match to resume a checkpoint).
    flat_optimizer: bool = False

    @property
    def num_scales(self) -> int:
        return len(ANCHORS)

    @property
    def anchors_per_scale(self) -> int:
        return len(ANCHORS[0])

    @property
    def head_channels(self) -> Tuple[int, int, int]:
        return (self.first_out * 4, self.first_out * 8, self.first_out * 16)
