from yolov5m_tpu.train.targets import build_grid_targets, anchor_iou_all
from yolov5m_tpu.train.loss import YoloLoss, LossConfig

__all__ = ["build_grid_targets", "anchor_iou_all", "YoloLoss", "LossConfig"]
