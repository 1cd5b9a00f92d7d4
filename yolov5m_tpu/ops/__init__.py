from yolov5m_tpu.ops.boxes import (
    iou_wh,
    box_iou,
    coco_to_yolo,
    xywh_to_xyxy,
    xyxy_to_xywh,
    xywhn_to_xyxy,
    xyxy_to_xywhn,
    clip_boxes,
    rescale_boxes,
)
from yolov5m_tpu.ops.decode import make_grid, decode_layer, decode_predictions, decode_grid_targets
from yolov5m_tpu.ops.nms import batched_nms, nms_single
from yolov5m_tpu.ops.postprocess import fused_detect

__all__ = [
    "iou_wh", "box_iou", "coco_to_yolo", "xywh_to_xyxy", "xyxy_to_xywh",
    "xywhn_to_xyxy", "xyxy_to_xywhn", "clip_boxes", "rescale_boxes",
    "make_grid", "decode_layer", "decode_predictions", "decode_grid_targets",
    "batched_nms", "nms_single", "fused_detect",
]
