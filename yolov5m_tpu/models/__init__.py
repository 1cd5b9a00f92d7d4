from yolov5m_tpu.models.yolo import YOLOv5, create_model
from yolov5m_tpu.models.blocks import CBL, Bottleneck, C3, SPPF

__all__ = ["YOLOv5", "create_model", "CBL", "Bottleneck", "C3", "SPPF"]
